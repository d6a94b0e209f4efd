"""flax variables -> PyTorch state_dict (the reverse of from_torch).

Lets users export trained generators back into reference-format
checkpoints (torch.save'able state_dicts with the reference's
Sequential key layout), so results can be validated inside the original
PyTorch codebase.  The reference's dead modules (NetworkA2B.unet /
unet_up, NetworkB2A.skip) never ran here so their keys are absent; the
reference loads such a dict with `load_state_dict(..., strict=False)`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ficsr_tpu.convert.from_torch import (
    _a2b_mapping,
    _b2a_mapping,
    _fsd_mapping,
)

__all__ = ["export_network_a2b", "export_network_b2a",
           "export_fs_discriminator", "save_torch_checkpoint"]


def _get(tree: dict, path) -> np.ndarray:
    node = tree
    for k in path:
        node = node[k]
    return np.asarray(node)


def _export(variables: dict, mapping) -> Dict[str, np.ndarray]:
    out = {}
    for tkey, (coll, path) in mapping.items():
        out[tkey] = _get(variables[coll], path)
    return out


def export_network_a2b(variables: dict) -> Dict[str, np.ndarray]:
    """{'params':..., 'batch_stats':...} -> reference netG_A2B keys."""
    return _export(variables, _a2b_mapping())


def export_network_b2a(variables: dict) -> Dict[str, np.ndarray]:
    return _export(variables, _b2a_mapping())


def export_fs_discriminator(variables: dict) -> Dict[str, np.ndarray]:
    return _export(variables, _fsd_mapping())


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray]):
    """Write a torch-loadable .pth from a numpy state_dict."""
    import torch

    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in state_dict.items()}, path)
