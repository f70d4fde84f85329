"""k-means YOLO prior fitting (SURVEY.md §2.2 "k-means priors")."""

import numpy as np
import pytest

from bdd100k_tpu.data.priors import (
    collect_box_shapes,
    kmeans_priors,
    mean_best_iou,
    priors_to_scales,
)


def _clustered_shapes(rng, n=600):
    """Three well-separated shape clusters, like road scenes (small
    lights/signs, medium cars, large trucks)."""
    centers = np.array([[0.03, 0.05], [0.12, 0.09], [0.5, 0.4]])
    wh = np.concatenate(
        [c * rng.lognormal(0.0, 0.15, size=(n // 3, 2)) for c in centers]
    )
    return np.clip(wh, 1e-3, 1.0)


def test_kmeans_recovers_clusters_and_is_deterministic():
    wh = _clustered_shapes(np.random.default_rng(0))
    c1, iou1 = kmeans_priors(wh, k=3, seed=0)
    c2, iou2 = kmeans_priors(wh, k=3, seed=0)
    np.testing.assert_array_equal(c1, c2)
    assert iou1 == iou2
    assert c1.shape == (3, 2)
    # area-ascending order
    areas = c1[:, 0] * c1[:, 1]
    assert np.all(np.diff(areas) > 0)
    # each centroid lands near one true cluster center (shape IoU > 0.75)
    assert iou1 > 0.75


def test_fitted_priors_beat_mismatched_priors():
    wh = _clustered_shapes(np.random.default_rng(1))
    c, fitted = kmeans_priors(wh, k=6, seed=0)
    bad = [(0.9, 0.9)] * 6  # all-large priors on mostly-small boxes
    assert fitted > mean_best_iou(wh, bad) + 0.2


def test_priors_to_scales_format_matches_config():
    c, _ = kmeans_priors(_clustered_shapes(np.random.default_rng(2)), k=9)
    priors = priors_to_scales(c, num_scales=3)
    assert len(priors) == 3 and all(len(s) == 3 for s in priors)
    # nested tuples of 2-float tuples — the DetectorConfig.yolo_priors form
    assert all(
        isinstance(p, tuple) and len(p) == 2 for s in priors for p in s
    )
    # finest scale (first) holds the smallest priors
    a = [np.mean([w * h for w, h in s]) for s in priors]
    assert a[0] < a[1] < a[2]
    # mean_best_iou accepts both the nested and the flat form
    wh = _clustered_shapes(np.random.default_rng(2))
    flat = [p for s in priors for p in s]
    assert mean_best_iou(wh, priors) == pytest.approx(mean_best_iou(wh, flat))

    with pytest.raises(ValueError):
        priors_to_scales(c[:8], num_scales=3)


def test_collect_box_shapes_and_small_input_errors():
    records = [
        {"boxes": np.array([[0.1, 0.1, 0.3, 0.5]]), "labels": np.array([1])},
        {"boxes": np.zeros((0, 4)), "labels": np.zeros((0,))},
    ]
    wh = collect_box_shapes(records)
    np.testing.assert_allclose(wh, [[0.2, 0.4]])
    with pytest.raises(ValueError):
        kmeans_priors(wh, k=2)


def test_cli_on_synthetic_labels(tmp_path, capsys):
    import json

    # hand-built BDD100K-format label JSON (no jax/synthetic deps)
    rng = np.random.default_rng(3)
    recs = []
    for i in range(8):
        labels = []
        for w, h in _clustered_shapes(rng, n=12)[:12]:
            x1, y1 = rng.uniform(0, 1 - w), rng.uniform(0, 1 - h)
            labels.append({
                "category": "car",
                "box2d": {"x1": x1 * 1280, "y1": y1 * 720,
                          "x2": (x1 + w) * 1280, "y2": (y1 + h) * 720},
            })
        recs.append({"name": f"im{i}.jpg", "labels": labels})
    labels_json = tmp_path / "labels.json"
    labels_json.write_text(json.dumps(recs))

    import sys

    sys.path.insert(0, "scripts")
    try:
        from kmeans_priors import main
    finally:
        sys.path.pop(0)

    out = tmp_path / "priors.json"
    main(["--labels", str(labels_json), "--k", "9", "--out", str(out)])
    assert "yolo_priors = (" in capsys.readouterr().out
    priors = json.loads(out.read_text())
    assert len(priors) == 3 and all(len(s) == 3 for s in priors)


def test_apply_yolo_priors_override(tmp_path):
    import json

    from bdd100k_tpu.configs import apply_yolo_priors, get_config

    priors = [[[0.05, 0.08], [0.1, 0.1]],
              [[0.2, 0.15], [0.3, 0.3]],
              [[0.5, 0.4], [0.8, 0.7]]]
    f = tmp_path / "priors.json"
    f.write_text(json.dumps(priors))

    cfg = get_config("yolo_tiny_64")
    new = apply_yolo_priors(cfg, str(f))
    assert new.yolo_priors == tuple(
        tuple((w, h) for w, h in s) for s in priors
    )
    # 2 priors/scale instead of 3 → anchor count shrinks by 1/3
    assert new.num_anchors == cfg.num_anchors // 3 * 2

    with pytest.raises(ValueError):
        apply_yolo_priors(get_config("ssd_tiny_64"), str(f))
    f.write_text(json.dumps(priors[:2]))
    with pytest.raises(ValueError):
        apply_yolo_priors(cfg, str(f))
