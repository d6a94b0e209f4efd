"""PyTorch state_dict -> flax variables converter.

Maps the reference checkpoints (torch.save(netG_A2B.state_dict()),
train.py:290-300) onto our module trees.  Because our layers keep
torch's OIHW / (in,out,kh,kw) kernel shapes, conversion is pure
re-keying — no transposes — which makes the ±0.1 dB pretrained-parity
target (BASELINE.md) a straight load.

Dead reference members (NetworkA2B.unet / unet_up — constructed but
never used in forward, model.py:241,254; NetworkB2A.skip, model.py:281)
are skipped: flax never materializes parameters for unused modules.

Key layouts (reference Sequential indices -> our named modules) are
documented inline per architecture.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "convert_network_a2b",
    "convert_network_b2a",
    "convert_fs_discriminator",
    "load_torch_checkpoint",
]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # copy, never view: torch's .numpy() shares the parameter buffer, so
    # a later in-place torch update (optimizer.step(), BN stat update)
    # would silently mutate the converted tree before JAX materializes
    # it on device (caught by tests/test_trajectory_parity.py)
    return np.array(x, dtype=np.float32, copy=True)


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv(mapping: dict, torch_prefix: str, flax_path: Tuple[str, ...],
          bias: bool = False):
    mapping[f"{torch_prefix}.weight"] = ("params", flax_path + ("weight",))
    if bias:
        mapping[f"{torch_prefix}.bias"] = ("params", flax_path + ("bias",))


def _bn(mapping: dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    mapping[f"{torch_prefix}.weight"] = ("params", flax_path + ("weight",))
    mapping[f"{torch_prefix}.bias"] = ("params", flax_path + ("bias",))
    mapping[f"{torch_prefix}.running_mean"] = (
        "batch_stats", flax_path + ("running_mean",))
    mapping[f"{torch_prefix}.running_var"] = (
        "batch_stats", flax_path + ("running_var",))


def _resblock(mapping: dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    """ResnetBlock/ResidualBlock: conv_block = [conv, bn, relu, conv, bn]."""
    _conv(mapping, f"{torch_prefix}.conv_block.0", flax_path + ("conv1",))
    _bn(mapping, f"{torch_prefix}.conv_block.1", flax_path + ("bn1",))
    _conv(mapping, f"{torch_prefix}.conv_block.3", flax_path + ("conv2",))
    _bn(mapping, f"{torch_prefix}.conv_block.4", flax_path + ("bn2",))


def _resnet_generator(mapping: dict, tp: str, fp: Tuple[str, ...],
                      n_blocks: int = 8):
    """ResnetGenerator Sequential (model.py:450-476):
    [pad, conv7, bn, relu, conv, bn, relu, conv, bn, relu,
     block x n, convT, bn, relu, convT, bn, relu, pad, conv7(bias)]."""
    _conv(mapping, f"{tp}.model.1", fp + ("stem",))
    _bn(mapping, f"{tp}.model.2", fp + ("stem_bn",))
    _conv(mapping, f"{tp}.model.4", fp + ("down0",))
    _bn(mapping, f"{tp}.model.5", fp + ("down0_bn",))
    _conv(mapping, f"{tp}.model.7", fp + ("down1",))
    _bn(mapping, f"{tp}.model.8", fp + ("down1_bn",))
    for i in range(n_blocks):
        _resblock(mapping, f"{tp}.model.{10 + i}", fp + (f"block{i}",))
    base = 10 + n_blocks
    _conv(mapping, f"{tp}.model.{base}", fp + ("up0",))
    _bn(mapping, f"{tp}.model.{base + 1}", fp + ("up0_bn",))
    _conv(mapping, f"{tp}.model.{base + 3}", fp + ("up1",))
    _bn(mapping, f"{tp}.model.{base + 4}", fp + ("up1_bn",))
    _conv(mapping, f"{tp}.model.{base + 7}", fp + ("head",), bias=True)


def _shallow_net(mapping: dict, tp: str, fp: Tuple[str, ...]):
    """shallowNet Sequential (model.py:430-438):
    [relu, convT/conv, bn, block, block, block, relu, conv, tanh]."""
    _conv(mapping, f"{tp}.model.1", fp + ("proj",))
    _bn(mapping, f"{tp}.model.2", fp + ("proj_bn",))
    for i in range(3):
        _resblock(mapping, f"{tp}.model.{3 + i}", fp + (f"block{i}",))
    _conv(mapping, f"{tp}.model.7", fp + ("head",))


def _shallow_frequency(mapping: dict, tp: str, fp: Tuple[str, ...]):
    """Sequential (model.py:242-246): [conv, lrelu, conv, bn, relu, conv, bn]."""
    _conv(mapping, f"{tp}.0", fp + ("conv0",))
    _conv(mapping, f"{tp}.2", fp + ("conv1",))
    _bn(mapping, f"{tp}.3", fp + ("bn1",))
    _conv(mapping, f"{tp}.5", fp + ("conv2",))
    _bn(mapping, f"{tp}.6", fp + ("bn2",))


def _patchgan(mapping: dict, tp: str, fp: Tuple[str, ...], n_layers: int = 5):
    """Discriminator Sequential (model.py:102-123): conv,lrelu, then
    (conv,bn,lrelu) x (n_layers-1), (conv,bn,lrelu) stride1, conv head."""
    _conv(mapping, f"{tp}.model.0", fp + ("conv0",), bias=True)
    idx = 2
    for n in range(1, n_layers):
        _conv(mapping, f"{tp}.model.{idx}", fp + (f"conv{n}",), bias=True)
        _bn(mapping, f"{tp}.model.{idx + 1}", fp + (f"bn{n}",))
        idx += 3
    _conv(mapping, f"{tp}.model.{idx}", fp + ("conv_s1",), bias=True)
    _bn(mapping, f"{tp}.model.{idx + 1}", fp + ("bn_s1",))
    idx += 3
    _conv(mapping, f"{tp}.model.{idx}", fp + ("head",), bias=True)


def _a2b_mapping() -> Dict[str, Tuple[str, Tuple[str, ...]]]:
    m: Dict[str, Tuple[str, Tuple[str, ...]]] = {}
    _shallow_frequency(m, "shallow_frequency", ("shallow_frequency",))
    _shallow_net(m, "shallow_up", ("shallow_up",))
    _conv(m, "skip.1", ("skip",))
    _bn(m, "skip.2", ("skip_bn",))
    _conv(m, "A2B_input.0", ("A2B_input",))
    _resnet_generator(m, "resnet", ("resnet",))
    return m


def _b2a_mapping() -> Dict[str, Tuple[str, Tuple[str, ...]]]:
    m: Dict[str, Tuple[str, Tuple[str, ...]]] = {}
    _shallow_frequency(m, "shallow_frequency", ("shallow_frequency",))
    _shallow_net(m, "shallow_up", ("shallow_up",))
    _conv(m, "B2A_input.0", ("B2A_input",))
    _resnet_generator(m, "resnet", ("resnet",))
    return m


def _fsd_mapping(n_layers: int = 5) -> Dict[str, Tuple[str, Tuple[str, ...]]]:
    m: Dict[str, Tuple[str, Tuple[str, ...]]] = {}
    _patchgan(m, "net", ("net",), n_layers)
    _patchgan(m, "net_dwt", ("net_dwt",), n_layers)
    return m


def _apply(state_dict: Mapping[str, object], mapping, strict_unused=()):
    variables = {"params": {}, "batch_stats": {}}
    for tkey, (coll, path) in mapping.items():
        if tkey not in state_dict:
            raise KeyError(f"missing key in torch state_dict: {tkey}")
        _set(variables[coll], path, _np(state_dict[tkey]))
    return variables


def convert_network_a2b(state_dict: Mapping[str, object]) -> dict:
    """Reference netG_A2B.state_dict() -> flax variables (unet/unet_up
    dead weights ignored)."""
    return _apply(state_dict, _a2b_mapping())


def convert_network_b2a(state_dict: Mapping[str, object]) -> dict:
    return _apply(state_dict, _b2a_mapping())


def convert_fs_discriminator(state_dict: Mapping[str, object],
                             n_layers: int = 5) -> dict:
    """FS_DiscriminatorA/B.state_dict() (DWT filter buffers ignored).

    n_layers: PatchGAN depth of the source nets (reference hardcodes 5,
    model.py:147-151; shallower variants are used by small-size tests)."""
    return _apply(state_dict, _fsd_mapping(n_layers))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict as numpy without requiring CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}
