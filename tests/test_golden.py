"""Golden pipeline parity (SURVEY.md §4.2 "Golden/parity"): fixture images
committed under tests/fixtures/, golden box/class/score outputs stored as
.npz, regenerated only deliberately:

    python -m tests.test_golden --regen

Two pipelines are pinned, one per head family:
  * tiny-SSD  — softmax scoring + SSD variance decode through NMS
  * tiny-YOLO — sigmoid·objectness scoring + σ-space decode through NMS
on fixed-init weights: JPEG decode → preprocess → forward → fused
decode/score/NMS. Any unintended change to anchor layout, box math,
scoring, or NMS keep decisions shifts these outputs.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"
GOLDEN = {
    "ssd": FIXTURES / "golden_tiny_ssd.npz",
    "yolo": FIXTURES / "golden_tiny_yolo.npz",
}
NUM_IMAGES = 4


def _pipeline_outputs(head: str):
    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.configs.detector_configs import tiny_test_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.data.pipeline import DetectionDataset
    from bdd100k_tpu.models.detector import build_detector

    dataset = DetectionDataset.from_bdd100k(
        FIXTURES / "labels.json", FIXTURES, max_boxes=16
    )
    assert len(dataset) == NUM_IMAGES
    images = np.stack([dataset[i]["image"] for i in range(NUM_IMAGES)])

    bundle = build_detector(tiny_test_config(head), dtype=jnp.float32)
    variables = bundle.init(jax.random.PRNGKey(0))

    def fwd(variables, images_u8):
        x = preprocess_eval_batch(images_u8, bundle.config.image_size)
        loc, cls = bundle.model.apply(variables, x, train=False)
        return bundle.postprocess(loc, cls)

    det = jax.jit(fwd)(variables, jnp.asarray(images))
    return jax.device_get(det)


def _regen():
    from bdd100k_tpu.data.synthetic import generate_synthetic_dataset

    FIXTURES.mkdir(exist_ok=True)
    if not (FIXTURES / "labels.json").exists():
        labels = generate_synthetic_dataset(
            FIXTURES / "_gen", num_images=NUM_IMAGES, seed=1234
        )
        # flatten into tests/fixtures/: images + labels.json side by side
        import shutil

        records = json.loads(Path(labels).read_text())
        for rec in records:
            shutil.move(
                str(FIXTURES / "_gen" / "images" / "train" / rec["name"]),
                str(FIXTURES / rec["name"]),
            )
        (FIXTURES / "labels.json").write_text(json.dumps(records))
        shutil.rmtree(FIXTURES / "_gen")

    for head, path in GOLDEN.items():
        det = _pipeline_outputs(head)
        np.savez(
            path,
            boxes=det.boxes, scores=det.scores,
            classes=det.classes, valid=det.valid,
        )
        print(f"regenerated {path}: {int(det.valid.sum())} valid detections")


@pytest.mark.parametrize("head", ["ssd", "yolo"])
def test_golden_pipeline_outputs(head):
    golden = np.load(GOLDEN[head])
    det = _pipeline_outputs(head)

    np.testing.assert_array_equal(det.valid, golden["valid"])
    v = golden["valid"]
    np.testing.assert_array_equal(det.classes[v], golden["classes"][v])
    np.testing.assert_allclose(
        det.scores[v], golden["scores"][v], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        det.boxes[v], golden["boxes"][v], rtol=1e-4, atol=1e-5
    )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        _regen()
    else:
        print(__doc__)
