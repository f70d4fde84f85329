"""L1 data pipeline (SURVEY.md §2.1).

Host side: BDD100K JSON label parsing, JPEG decode workers, record shards.
Device side: one jitted `augment_batch` fusing normalize + photometric
jitter + SSD crop/expand (a single affine resample) + flip, plus
double-buffered HBM prefetch (BASELINE.json:5).
"""

from bdd100k_tpu.data.bdd100k import (
    BDD100K_CATEGORY_TO_ID,
    load_bdd100k_labels,
    parse_bdd100k_record,
)
from bdd100k_tpu.data.augment import AugmentConfig, augment_batch, preprocess_eval_batch
from bdd100k_tpu.data.synthetic import generate_synthetic_dataset
from bdd100k_tpu.data.pipeline import (
    Batch,
    DetectionDataset,
    make_loader,
    prefetch_to_device,
)
