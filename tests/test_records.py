"""ArrayRecord converter/reader parity with the direct JSON+JPEG pipeline
(SURVEY.md §2.1 record converter)."""

import numpy as np
import pytest

from bdd100k_tpu.data.pipeline import DetectionDataset
from bdd100k_tpu.data.records import (
    ArrayRecordDetectionDataset,
    convert_bdd100k_to_arrayrecord,
    make_grain_loader,
)
from bdd100k_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    labels = generate_synthetic_dataset(root, num_images=6, seed=3)
    return root, labels


def test_arrayrecord_roundtrip_matches_json(synth, tmp_path):
    root, labels = synth
    image_dir = root / "images" / "train"
    shards = convert_bdd100k_to_arrayrecord(
        labels, image_dir, tmp_path / "rec", shard_size=4
    )
    assert len(shards) == 2  # 6 records / shard_size 4

    direct = DetectionDataset.from_bdd100k(labels, image_dir, max_boxes=16)
    packed = ArrayRecordDetectionDataset(tmp_path / "rec", max_boxes=16)
    assert len(packed) == len(direct) == 6
    for i in range(6):
        a, b = direct[i], packed[i]
        assert a["name"] == b["name"]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-6)
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_tfrecord_roundtrip_matches_json(synth, tmp_path):
    from bdd100k_tpu.data.records import (
        TFRecordDetectionDataset,
        convert_bdd100k_to_tfrecord,
    )

    root, labels = synth
    image_dir = root / "images" / "train"
    shards = convert_bdd100k_to_tfrecord(
        labels, image_dir, tmp_path / "tfr", shard_size=4
    )
    assert len(shards) == 2

    direct = DetectionDataset.from_bdd100k(labels, image_dir, max_boxes=16)
    packed = TFRecordDetectionDataset(tmp_path / "tfr", max_boxes=16)
    assert len(packed) == len(direct) == 6
    for i in range(6):
        a, b = direct[i], packed[i]
        assert a["name"] == b["name"]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-6)
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_grain_loader_batches(synth, tmp_path):
    root, labels = synth
    convert_bdd100k_to_arrayrecord(
        labels, root / "images" / "train", tmp_path / "rec", shard_size=8
    )
    ds = ArrayRecordDetectionDataset(tmp_path / "rec", max_boxes=16)
    batches = list(
        make_grain_loader(
            ds, batch_size=2, shuffle=True, seed=0, num_epochs=1,
            num_workers=0,
        )
    )
    assert len(batches) == 3
    b = batches[0]
    assert b.images.shape == (2, 720, 1280, 3) and b.images.dtype == np.uint8
    assert b.boxes.shape == (2, 16, 4)
    assert b.mask.dtype == bool
