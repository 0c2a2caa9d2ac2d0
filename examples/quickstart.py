"""End-to-end quickstart: train -> evaluate -> export -> score -> serve.

Runs entirely on synthetic data (no dataset download), on whatever backend
JAX finds — a TPU if attached, else CPU.  This is the full lifecycle a user
of the reference repo would assemble from five separate scripts
(``avenue_training_script2.py`` for training, ``minicausal_vad_complete3.py``
for eval, nothing for deployment):

    python examples/quickstart.py [--epochs 2] [--out /tmp/cvad_quickstart]

Steps:
  1. build the family-D (flagship) config with a synthetic clip dataset
  2. train for a couple of epochs with the jitted Trainer
  3. evaluate (8-metric dict, reference schema)
  4. export the trained scorer to a self-contained .jaxexport blob
  5. reload the blob with NO model code and score a batch
  6. (optional, --serve) put it behind the HTTP endpoint and score via POST
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--clips", type=int, default=64,
                    help="synthetic training clips")
    ap.add_argument("--out", default="/tmp/cvad_quickstart")
    ap.add_argument("--serve", action="store_true",
                    help="also spin up the HTTP endpoint and POST one batch")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # 1. config: family-D preset, synthetic data
    from cvad_tpu.config import preset

    cfg = preset("avenue_improved")
    cfg = cfg.replace(
        data=cfg.data.replace(dataset="synthetic",
                              batch_size=args.batch_size),
        train=cfg.train.replace(num_epochs=args.epochs, out_dir=str(out),
                                eval_every=1, log_every=10),
    )

    # 2. train
    from cvad_tpu.train.engine import Trainer, make_loaders

    trainer = Trainer(cfg)
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=args.clips)
    history = trainer.fit(train_loader, eval_loader)
    print(f"trained {args.epochs} epochs; final loss "
          f"{history['train_losses'][-1]:.4f}")

    # 3. evaluate (the reference's 8-metric dict)
    metrics = (history["evaluation_metrics"] or [{}])[-1]
    print("eval:", json.dumps({k: round(float(v), 5)
                               for k, v in metrics.items()}))

    # 4. export the trained scorer as a deployment artifact
    import jax

    from cvad_tpu.evaluation.serving import export_scorer, load_scorer

    # multi-platform lowering: the blob runs on TPU hosts AND cpu-only
    # serving boxes (lowering for a platform needs no device of that kind)
    blob = export_scorer(jax.device_get(trainer.state.variables()),
                         platforms=("tpu", "cpu"))
    blob_path = out / "scorer.jaxexport"
    blob_path.write_bytes(blob)
    print(f"exported {len(blob)} bytes -> {blob_path}")

    # 5. reload with no model code and score
    score = load_scorer(blob_path.read_bytes())
    clips = np.random.default_rng(0).uniform(
        0, 1, (4,) + score.clip_shape).astype(np.float32)
    scores, graphs = score(clips)
    print("blob scores:", np.round(scores, 4).tolist(),
          "graphs:", graphs.shape)

    # 6. optional: HTTP serving
    if args.serve:
        import io
        import urllib.request

        from cvad_tpu.evaluation.http_service import (ScoringHTTPServer,
                                                      service_from_path)

        srv = ScoringHTTPServer(service_from_path(str(blob_path)), port=0)
        srv.start()
        buf = io.BytesIO()
        np.savez(buf, clips=clips)
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/score", data=buf.getvalue(),
            method="POST",
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=300) as r:
            print("HTTP scores:", json.loads(r.read().decode())["scores"])
        srv.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
