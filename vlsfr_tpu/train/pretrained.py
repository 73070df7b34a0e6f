"""Pretrained backbone loading — the reference's dead flag made real.

``--pretrained_model_path`` flows into the reference FFC but is never read
(main.py:155 → ffc.py:11-55; SURVEY.md C16). Here it loads either:

* a PyTorch checkpoint of the reference architectures (``.pt``/``.pth``,
  both bare state_dicts and the reference's ``{'state_dict': ...}`` snapshot
  format from main.py:85), converted via models/torch_import.py, or
* an orbax checkpoint directory from a previous vlsfr_tpu run (restores
  ``probe_params``/``probe_stats``).

Both probe and gallery start from the loaded weights, matching the
reference's init-time copy (ffc.py:53-55).
"""

from __future__ import annotations

import os

import jax


def load_pretrained_backbone(path: str, net_type: str, feat_dim: int) -> dict:
    """Returns {"params": ..., "batch_stats": ...} for the backbone."""
    if path.endswith((".pt", ".pth")):
        from vlsfr_tpu.models.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path, net_type, feat_dim)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(os.path.abspath(path))
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        restored = mngr.restore(step)["state"]
        if "probe_params" in restored:  # FFCState layout
            return {"params": restored["probe_params"], "batch_stats": restored["probe_stats"]}
        if "params" in restored and "backbone" in restored["params"]:  # SoftmaxState
            return {
                "params": restored["params"]["backbone"],
                "batch_stats": restored["batch_stats"],
            }
        raise ValueError(f"unrecognized checkpoint layout under {path}")
    raise ValueError(f"pretrained_model_path {path!r}: expected .pt file or checkpoint dir")


def apply_pretrained(state, variables: dict):
    """Install loaded backbone weights into a fresh train state (FFC or
    softmax), keeping optimizer state zeroed."""
    params = jax.tree.map(lambda x: x, variables["params"])
    stats = variables.get("batch_stats", {})
    if hasattr(state, "probe_params"):  # FFCState
        return state.replace(
            probe_params=params,
            probe_stats=stats,
            gallery_params=jax.tree.map(lambda x: x, params),
            gallery_stats=jax.tree.map(lambda x: x, stats),
        )
    new_params = dict(state.params, backbone=params)
    return state.replace(params=new_params, batch_stats=stats)
