"""Per-block feature-correlation analysis for the family-C 3D CNN.

The reference repository ships ``Figure 2025-09-04 180626.png`` — three
per-conv-block channel-correlation heatmaps (8x8, 16x16, 32x32, matching
``minicausal_vad_complete3.py:36-57``'s channel widths) — but the script
that produced it is not in the repo (SURVEY.md §2.4).  This module is that
tool's framework analog: capture each block's post-BN activations in one
jitted forward, correlate channels over every (sample, time, space)
position, and render the three-panel figure (``cvad plots
--block-correlation``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def block_channel_correlations(variables, clips, model=None
                               ) -> List[np.ndarray]:
    """Per-block channel-correlation matrices from one forward pass.

    Returns one (C_i, C_i) Pearson correlation matrix per conv block
    (default family-C widths: 8, 16, 32), computed from the block's
    activations (post-BN, ReLU applied here so the statistics match the
    block's actual output) flattened over batch/time/space.  Constant
    channels (e.g. entirely-dead ReLU units) produce NaN rows — replaced
    with 0 off-diagonal / 1 on-diagonal so the figure renders.
    """
    from cvad_tpu.models import Simple3DCNNDetector

    m = model or Simple3DCNNDetector()
    _, mods = m.apply(
        variables, np.asarray(clips, np.float32), train=False,
        deterministic=True,
        capture_intermediates=lambda mdl, _: (mdl.name or "").startswith("bn_"))
    inter = mods["intermediates"]
    mats = []
    for i in range(len(inter)):
        act = np.asarray(inter[f"bn_{i}"]["__call__"][0], np.float32)
        act = np.maximum(act, 0.0)  # block output is post-ReLU
        flat = act.reshape(-1, act.shape[-1])  # (B*T*H*W, C)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.corrcoef(flat.T)
        corr = np.where(np.isfinite(corr), corr, 0.0)
        np.fill_diagonal(corr, 1.0)
        mats.append(corr)
    return mats


def plot_block_correlations(mats: List[np.ndarray], out_path: str,
                            title: str = "Per-block feature correlations"
                            ) -> Optional[str]:
    """Three-panel heatmap figure matching the reference's shipped
    ``Figure 2025-09-04 180626.png`` layout.  Returns the written path, or
    None when matplotlib is unavailable."""
    from cvad_tpu.evaluation.plots import _plt

    plt = _plt()
    if plt is None:
        return None
    fig, axes = plt.subplots(1, len(mats), figsize=(5 * len(mats), 4.4))
    axes = np.atleast_1d(axes)
    for i, (ax, corr) in enumerate(zip(axes, mats)):
        im = ax.imshow(corr, cmap="coolwarm", vmin=-1.0, vmax=1.0)
        c = corr.shape[0]
        ax.set_title(f"Block {i + 1} ({c}x{c})")
        ax.set_xlabel("channel")
        if i == 0:
            ax.set_ylabel("channel")
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
