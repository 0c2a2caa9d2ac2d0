"""Trace the production family-D train step with jax.profiler and print the
per-op device-time breakdown (needs tensorboard_plugin_profile to parse the
xplane proto). Context only — not part of the bench contract.
"""
from __future__ import annotations

import glob
import gzip
import json
import sys

import numpy as np

BATCH = 256
CLIP_SHAPE = (8, 64, 64, 3)


def main():
    import jax

    from cvad_tpu.config import preset
    from cvad_tpu.runtime.mesh import create_mesh
    from cvad_tpu.train.engine import Trainer

    cfg = preset("family_d")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=BATCH),
        train=cfg.train.replace(out_dir="/tmp/cvad_prof", log_every=10**9,
                                dtype="bfloat16", steps_per_call=1))
    trainer = Trainer(cfg, mesh=create_mesh())
    rng = np.random.default_rng(0)
    batch = {
        "clips": rng.integers(0, 256, (BATCH,) + CLIP_SHAPE, dtype=np.uint8),
        "labels": np.zeros(BATCH, np.float32),
    }
    trainer.init_state(batch)
    sharded = trainer.put_batch(batch)
    for _ in range(3):
        trainer.state, m = trainer._jit_train(trainer.state, sharded,
                                              trainer._rng)
    np.asarray(m)

    logdir = "/tmp/cvad_trace"
    with jax.profiler.trace(logdir):
        for _ in range(10):
            trainer.state, m = trainer._jit_train(trainer.state, sharded,
                                                  trainer._rng)
        np.asarray(m)

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, file=sys.stderr)
    if not files:
        print("no trace captured (remote backend may not support profiling)")
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

        data, _ = r2t.xspace_to_tool_data(files, "hlo_op_profile", {})
    except Exception as e:
        print("hlo_op_profile failed:", e, file=sys.stderr)
        try:
            from tensorboard_plugin_profile.convert import (
                raw_to_tool_data as r2t)

            data, _ = r2t.xspace_to_tool_data(files, "op_profile", {})
        except Exception as e2:
            print("op_profile failed too:", e2)
            return
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    out = "/tmp/cvad_trace/op_profile.json"
    with open(out, "w") as f:
        f.write(data)
    print("wrote", out, file=sys.stderr)
    try:
        prof = json.loads(data)
        # op_profile json: byProgram/byCategory trees with .metrics.time
        def walk(node, depth=0):
            name = node.get("name", "?")
            m = node.get("metrics", {})
            t = m.get("time", m.get("timeFraction"))
            if depth <= 3 and t:
                print(f"{'  '*depth}{name}: {t}")
            for c in node.get("children", [])[:12]:
                walk(c, depth + 1)

        root = prof.get("byCategory") or prof.get("byProgram") or prof
        walk(root)
    except Exception as e:
        print("parse failed:", e, "— inspect", out)


if __name__ == "__main__":
    main()
