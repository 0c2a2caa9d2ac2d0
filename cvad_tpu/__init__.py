"""cvad_tpu — TPU-native causal-learning video anomaly detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference repo
`pvvkishore/Causal-Learning-Based-Video-Anomaly-Detection_Paper_Code_Raw`
(five model families, three datasets, multi-objective causal training, memory
banks, anomaly scoring, bbox localization, evaluation/visualization,
checkpointing), designed TPU-first:

- models are `flax.linen` modules compiled under `jax.jit` with static shapes;
- the ragged Python-loop stages of the reference become fixed-shape masked ops;
- data parallelism is a `jax.sharding.Mesh` with XLA collectives over ICI
  (the reference has no distributed code at all — SURVEY.md §2.9);
- hot ops have Pallas TPU kernels with XLA fallbacks (`cvad_tpu.ops`);
- the host data path is a prefetching, double-buffered device feed with an
  optional C++ decode core (`native/`).

Layer map (mirrors SURVEY.md §1, made explicit):
  L1 runtime   -> cvad_tpu.runtime   (mesh, rng, checkpoint, history, metrics)
  L2 data      -> cvad_tpu.data      (frame datasets, clip windowing, batcher)
  L3 models    -> cvad_tpu.models    (families A..E), cvad_tpu.ops (kernels)
  L4 training  -> cvad_tpu.train     (losses, optimizers, jitted steps, engine)
  L5 eval/viz  -> cvad_tpu.evaluation (metrics, scoring, plots, reports)
  L6 drivers   -> cvad_tpu.cli       (entry points mirroring reference scripts)
"""

__version__ = "0.1.0"

from cvad_tpu import config as config  # noqa: F401
