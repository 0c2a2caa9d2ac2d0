"""Alias package: the full repo-name import resolves to :mod:`cvad_tpu`.

``import causal_learning_based_video_anomaly_detection_paper_code_raw_tpu as f``
gives the same module object as ``import cvad_tpu``.
"""

import sys

import cvad_tpu

sys.modules[__name__] = cvad_tpu
