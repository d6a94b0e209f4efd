"""ficsr_tpu.tpu_tuning — adopted libtpu flag wiring.

The +6.4% inference win (libtpu_vmem64m, benchmarks/xla_flags_probe.json)
is adopted by appending to LIBTPU_INIT_ARGS before the first jax import.
These tests pin the env manipulation, the opt-outs, and the property the
whole mechanism depends on: importing ``ficsr_tpu.tpu_tuning`` must not
itself import jax (lazy package __init__, PEP 562).
"""

import os
import subprocess
import sys
import warnings

import pytest

from ficsr_tpu import tpu_tuning

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(monkeypatch):
    monkeypatch.delenv("FICSR_NO_TPU_TUNING", raising=False)
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)


def test_apply_sets_flag(monkeypatch):
    _clean_env(monkeypatch)
    assert tpu_tuning.apply() is True
    assert os.environ["LIBTPU_INIT_ARGS"] == tpu_tuning.SCOPED_VMEM_FLAG


def test_apply_appends_to_existing_args(monkeypatch):
    _clean_env(monkeypatch)
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--xla_foo=1")
    assert tpu_tuning.apply() is True
    assert os.environ["LIBTPU_INIT_ARGS"] == (
        "--xla_foo=1 " + tpu_tuning.SCOPED_VMEM_FLAG)


def test_apply_respects_user_vmem_choice(monkeypatch):
    _clean_env(monkeypatch)
    user = "--xla_tpu_scoped_vmem_limit_kib=8192"
    monkeypatch.setenv("LIBTPU_INIT_ARGS", user)
    assert tpu_tuning.apply() is False
    assert os.environ["LIBTPU_INIT_ARGS"] == user


def test_apply_opt_out(monkeypatch):
    _clean_env(monkeypatch)
    monkeypatch.setenv("FICSR_NO_TPU_TUNING", "1")
    assert tpu_tuning.apply() is False
    assert "LIBTPU_INIT_ARGS" not in os.environ


def test_apply_warns_after_backend_init(monkeypatch):
    monkeypatch.delenv("FICSR_NO_TPU_TUNING", raising=False)
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    import jax
    jax.devices()  # force backend init (conftest runs on CPU)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tpu_tuning.apply()
    assert any("backend initialized" in str(x.message) for x in w)


def test_apply_no_warning_on_bare_jax_import(monkeypatch):
    """sitecustomize imports jax eagerly on some hosts; a bare import
    must NOT trigger the too-late warning (libtpu reads the env var at
    plugin init, not at import — verified live: bench.py under an
    eager-jax sitecustomize still measured the vmem64 +6.4%)."""
    _clean_env(monkeypatch)
    xb = sys.modules.get("jax._src.xla_bridge")
    saved = getattr(xb, "_backends", None) if xb else None
    if xb is not None:
        monkeypatch.setattr(xb, "_backends", {}, raising=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert tpu_tuning.apply() is True
    assert not w
    if xb is not None and saved is not None:
        monkeypatch.setattr(xb, "_backends", saved, raising=False)


@pytest.mark.slow
def test_tpu_tuning_importable_without_jax():
    """The load-bearing property: entry points import ficsr_tpu.tpu_tuning
    and call apply() BEFORE jax initializes, so the package __init__ must
    stay jax-free (lazy submodule loading)."""
    code = (
        "import sys, os\n"
        "os.environ.pop('FICSR_NO_TPU_TUNING', None)\n"
        "os.environ.pop('LIBTPU_INIT_ARGS', None)\n"
        "from ficsr_tpu import tpu_tuning\n"
        "assert 'jax' not in sys.modules, 'package __init__ imported jax'\n"
        "assert tpu_tuning.apply() is True\n"
        "assert 'scoped_vmem_limit' in os.environ['LIBTPU_INIT_ARGS']\n"
        "import ficsr_tpu\n"
        # lazy attrs advertised (real resolution needs site-packages,
        # covered in-process by test_lazy_package_getattr)
        "assert 'models' in dir(ficsr_tpu)\n"
    )
    env = dict(os.environ)
    # sitecustomize on this host may import jax eagerly; isolate from it
    env["PYTHONNOUSERSITE"] = "1"
    r = subprocess.run([sys.executable, "-S", "-c",
                        "import sys; sys.path.insert(0, %r); %s"
                        % (REPO, "exec(%r)" % code)],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr


def test_lazy_package_getattr():
    import ficsr_tpu
    assert ficsr_tpu.tpu_tuning is tpu_tuning
    with pytest.raises(AttributeError):
        ficsr_tpu.does_not_exist
