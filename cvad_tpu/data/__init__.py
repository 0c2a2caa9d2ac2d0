"""L2 data pipeline: frame-folder datasets, clip windowing, synthetic-label
policies, host decode backends, and the prefetching device batcher.

Reference counterparts: SURVEY.md §2.1 — the three UCSD Ped2 dataset variants,
`UCSDped2SimpleDataset`, the inference clip extractor, and the missing Avenue
loader whose contract is reconstructed from call sites
(``avenue_training_script2.py:357-365``).
"""

from cvad_tpu.data.frames import scan_video_folders, clip_windows  # noqa: F401
from cvad_tpu.data.datasets import (  # noqa: F401
    AvenueDataset,
    ClipDataset,
    SyntheticClipDataset,
    UCSDPed2Dataset,
    build_dataset,
    create_avenue_dataloaders,
)
from cvad_tpu.data.batcher import BatchLoader, DevicePrefetcher  # noqa: F401
from cvad_tpu.data.synthetic import (  # noqa: F401
    make_synthetic_clips,
    write_synthetic_video_tree,
)
