"""Serving-export round trip: export_sr -> serialize -> deserialize ->
call must reproduce the live model on multiple batch sizes (symbolic
batch dim), without importing model code at load time."""

import numpy as np
import jax
import jax.numpy as jnp

from ficsr_tpu.serving import export_sr, load_sr, make_infer_fn
from ficsr_tpu.train.state import MODELS


def test_export_roundtrip(tmp_path):
    model = MODELS["a2b"]
    x0 = jnp.zeros((1, 1, 64, 64), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)

    blob = export_sr(variables, size=64)
    path = tmp_path / "sr.bin"
    path.write_bytes(blob)

    live = jax.jit(make_infer_fn(variables))
    served = load_sr(str(path))

    for batch in (1, 3):
        x = jax.random.normal(jax.random.PRNGKey(batch), (batch, 1, 64, 64))
        np.testing.assert_allclose(
            np.asarray(served(x)), np.asarray(live(x)),
            rtol=1e-5, atol=1e-5)
        assert served(x).shape == (batch, 1, 64, 64)
