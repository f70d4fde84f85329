"""Native C++ decode pool vs the Python (cv2/PIL) decode path
(SURVEY.md §2.7 'host-side decode workers')."""

import numpy as np
import pytest

from bdd100k_tpu.data import native_decode as nd
from bdd100k_tpu.data.pipeline import DetectionDataset, make_loader
from bdd100k_tpu.data.synthetic import generate_synthetic_dataset

pytestmark = pytest.mark.skipif(
    not nd.available(), reason="native decode pool not buildable here"
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_nd")
    labels = generate_synthetic_dataset(root, num_images=5, seed=9)
    return root, labels


def test_native_matches_python_loader(synth):
    root, labels = synth
    ds = DetectionDataset.from_bdd100k(
        labels, root / "images" / "train", max_boxes=16, decode_size=300
    )
    kw = dict(batch_size=5, shuffle=False, num_epochs=1, num_workers=2)
    b_native = next(iter(make_loader(ds, native_decode=True, **kw)))
    b_python = next(iter(make_loader(ds, native_decode=False, **kw)))

    assert b_native.images.shape == (5, 300, 300, 3)
    np.testing.assert_array_equal(b_native.boxes, b_python.boxes)
    np.testing.assert_array_equal(b_native.labels, b_python.labels)
    np.testing.assert_array_equal(b_native.mask, b_python.mask)
    # decoders agree to ±2 gray levels (different bilinear rounding)
    diff = np.abs(
        b_native.images.astype(int) - b_python.images.astype(int)
    )
    assert diff.mean() < 1.0 and diff.max() <= 3, (diff.mean(), diff.max())


def test_native_rejects_garbage():
    dec = nd.NativeDecoder(2)
    with pytest.raises(ValueError):
        dec.decode_batch([b"not a jpeg"], 64)
