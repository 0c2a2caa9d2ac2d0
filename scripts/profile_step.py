"""Trace the production family-D train step with jax.profiler and print the
per-op device-time breakdown (parses the xplane proto directly).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/profile_step.py [native|tpair] [steps_per_call]
Context only — not part of the bench contract.
"""
from __future__ import annotations

import collections
import glob
import shutil
import sys

import numpy as np

import os

BATCH = int(os.environ.get("CVAD_PROF_BATCH", 256))
# full clip shape override, e.g. CVAD_PROF_SHAPE=8,240,360,1 for family_a
_shape = os.environ.get("CVAD_PROF_SHAPE")
CLIP_SHAPE = (tuple(int(s) for s in _shape.split(",")) if _shape
              else (int(os.environ.get("CVAD_PROF_T", 8)), 64, 64, 3))


def trace_step(mode: str, steps_per_call: int, logdir: str) -> None:
    import jax

    from cvad_tpu.config import preset
    from cvad_tpu.runtime.mesh import create_mesh
    from cvad_tpu.train.engine import Trainer

    fam = os.environ.get("CVAD_PROF_PRESET", "family_d")
    cfg = preset(fam)
    if fam == "family_d":
        model_kw = ({"conv_stack": mode}
                    if mode in ("folded", "folded2", "folded3")
                    else {"conv_stack": "ndhwc", "conv1_mode": mode})
        if os.environ.get("CVAD_PROF_GIMPL"):
            model_kw["conv_group_impl"] = os.environ["CVAD_PROF_GIMPL"]
        cfg = cfg.replace(model=cfg.model.replace(**model_kw))
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=BATCH),
        train=cfg.train.replace(out_dir="/tmp/cvad_prof", log_every=10**9,
                                dtype=os.environ.get("CVAD_PROF_DTYPE",
                                                     "bfloat16"),
                                steps_per_call=steps_per_call))
    trainer = Trainer(cfg, mesh=create_mesh())
    rng = np.random.default_rng(0)
    batch = {
        "clips": rng.integers(0, 256, (BATCH,) + CLIP_SHAPE, dtype=np.uint8),
        "labels": np.zeros(BATCH, np.float32),
    }
    trainer.init_state(batch)
    if steps_per_call > 1:
        chunk = trainer.put_chunk([batch] * steps_per_call)
        step = lambda: trainer._jit_train_multi(trainer.state, chunk,
                                                trainer._rng)
    else:
        sharded = trainer.put_batch(batch)
        step = lambda: trainer._jit_train(trainer.state, sharded, trainer._rng)
    for _ in range(3):
        trainer.state, m = step()
    np.asarray(m)

    with jax.profiler.trace(logdir):
        for _ in range(10):
            trainer.state, m = step()
        np.asarray(m)


def report(logdir: str, steps: int = 10) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no trace captured")
        return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[0], "rb").read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        em = p.event_metadata
        agg: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        for line in p.lines:
            for e in line.events:
                name = (em[e.metadata_id].name
                        if e.metadata_id in em else str(e.metadata_id))
                if (not name.startswith(("%", "jit_"))
                        or name.startswith(("%copy-start", "%copy-done",
                                            "%slice-start", "%slice-done",
                                            "%all-reduce-start"))):
                    continue  # async spans overlap compute; don't count
                agg[name] += e.duration_ps / 1e6
                cnt[name] += 1
        step_events = [(n, us) for n, us in agg.items()
                       if n.startswith("jit_")]
        for n, us in step_events:
            print(f"STEP {n[:40]:42s} {us/steps:9.1f} us/step")
        op_total = sum(us for n, us in agg.items() if not n.startswith("jit_"))
        print(f"SUM of ops: {op_total/steps:9.1f} us/step "
              f"(gaps = step - sum)")
        print(f"{'-'*78}")
        rows = int(os.environ.get("CVAD_PROF_ROWS", 40))
        width = int(os.environ.get("CVAD_PROF_WIDTH", 100))
        for name, us in agg.most_common(rows):
            if name.startswith("jit_"):
                continue
            print(f"  {us/steps:9.1f} us/step x{cnt[name]:<4d} {name[:width]}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "native"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    logdir = f"/tmp/cvad_trace_{mode}_{k}"
    shutil.rmtree(logdir, ignore_errors=True)
    trace_step(mode, k, logdir)
    print(f"=== mode={mode} steps_per_call={k} ===")
    report(logdir, steps=10 * k)


if __name__ == "__main__":
    main()
