"""Round-trip: flax -> torch state_dict -> reference model forward
matches our forward (validates the reverse converter)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from ficsr_tpu.convert import from_torch
from ficsr_tpu.convert.to_torch import export_network_a2b, save_torch_checkpoint
from ficsr_tpu.models import NetworkA2B

from . import ref_shims


def test_export_roundtrip_through_reference(rng, tmp_path):
    model = NetworkA2B()
    x = jnp.asarray(rng.randn(1, 1, 64, 64).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(42), x, x, train=False)

    # export -> .pth -> load into the reference torch model
    sd = export_network_a2b(variables)
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, sd)

    ref_model = ref_shims.load_reference_module("model")
    net = ref_model.NetworkA2B()
    missing, unexpected = net.load_state_dict(
        torch.load(path, weights_only=True), strict=False)
    assert not unexpected
    # only the dead unet/unet_up keys may be missing
    assert all(k.startswith(("unet.", "unet_up.")) for k in missing)
    net.eval()

    lf = rng.randn(1, 1, 128, 128).astype(np.float32)
    hf = rng.randn(1, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        _, _, out_ref = net(torch.from_numpy(lf), torch.from_numpy(hf))
    out, _ = model.apply(variables, jnp.asarray(lf), jnp.asarray(hf),
                         train=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out[2]), out_ref.numpy(), atol=2e-4)


def test_export_import_identity(rng):
    """export -> import returns the identical tree."""
    model = NetworkA2B()
    x = jnp.zeros((1, 1, 64, 64), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    sd = export_network_a2b(variables)
    back = from_torch.convert_network_a2b(sd)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(variables["params"]),
                   key=str),
            sorted(jax.tree_util.tree_leaves_with_path(back["params"]),
                   key=str)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
