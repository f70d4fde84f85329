"""Pretrained-backbone import converter tests (SURVEY.md §2.3, §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from bdd100k_tpu.configs.detector_configs import tiny_test_config
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.models.vgg import VGG16Backbone
from bdd100k_tpu.utils.pretrained import (
    convert_torch_vgg16,
    flatten_tree,
    load_params_npz,
    save_params_npz,
    unflatten_into,
)


def test_npz_backbone_transplant(tmp_path):
    """Train-one-config → seed-another: backbone params move bit-exact,
    heads keep their fresh init."""
    bundle = build_detector(tiny_test_config("ssd"), dtype=jnp.float32)
    donor = bundle.init(jax.random.PRNGKey(1))
    path = tmp_path / "backbone.npz"
    save_params_npz(donor["params"], path, subtree="backbone")

    fresh = bundle.init(jax.random.PRNGKey(2))
    merged = load_params_npz(fresh, path, subtree="params/backbone")

    d = flatten_tree(donor["params"]["backbone"])
    m = flatten_tree(merged["params"]["backbone"])
    for k in d:
        np.testing.assert_array_equal(d[k], m[k])
    # head params untouched (still from key 2)
    f_head = flatten_tree(fresh["params"]["head0"])
    m_head = flatten_tree(merged["params"]["head0"])
    for k in f_head:
        np.testing.assert_array_equal(f_head[k], m_head[k])


def test_unflatten_shape_check():
    tree = {"a": np.zeros((2, 3))}
    try:
        unflatten_into(tree, {"a": np.zeros((3, 2))})
    except ValueError as e:
        assert "shape mismatch" in str(e)
    else:
        raise AssertionError("expected shape mismatch error")


def test_torch_pth_import_roundtrip(tmp_path):
    """Full .pth path: torch.save → import_torch_vgg16 → forward runs."""
    import torch

    from bdd100k_tpu.utils.pretrained import import_torch_vgg16

    chans = [
        (3, 64), (64, 64), (64, 128), (128, 128),
        (128, 256), (256, 256), (256, 256),
        (256, 512), (512, 512), (512, 512),
        (512, 512), (512, 512), (512, 512),
    ]
    idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    g = torch.Generator().manual_seed(0)
    sd = {}
    for i, (ci, co) in zip(idx, chans):
        sd[f"features.{i}.weight"] = torch.randn(co, ci, 3, 3, generator=g)
        sd[f"features.{i}.bias"] = torch.randn(co, generator=g)
    path = tmp_path / "vgg16.pth"
    torch.save(sd, path)

    model = VGG16Backbone(dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    merged = import_torch_vgg16(variables, path)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["block4"]["conv3"]["kernel"]),
        sd["features.21.weight"].numpy().transpose(2, 3, 1, 0),
    )
    taps = model.apply(merged, jnp.ones((1, 64, 64, 3)), train=False)
    assert [t.shape for t in taps] == [(1, 8, 8, 512), (1, 4, 4, 1024)]


def _fake_hf_mobilenet_v1_state_dict(seed=0, prefix=""):
    """Synthetic HF-transformers MobileNetV1 layout (conv_stem + 26
    alternating dw/pw layers), random weights."""
    rng = np.random.RandomState(seed)
    chans = [32]
    for c in (64, 128, 128, 256, 256, 512, 512, 512, 512, 512, 512, 1024,
              1024):
        chans.append(c)
    sd = {}

    def conv_bn(name, w_shape, out_c):
        sd[f"{prefix}{name}.convolution.weight"] = rng.randn(
            *w_shape
        ).astype(np.float32)
        sd[f"{prefix}{name}.normalization.weight"] = rng.rand(out_c).astype(
            np.float32
        )
        sd[f"{prefix}{name}.normalization.bias"] = rng.randn(out_c).astype(
            np.float32
        )
        sd[f"{prefix}{name}.normalization.running_mean"] = rng.randn(
            out_c
        ).astype(np.float32)
        sd[f"{prefix}{name}.normalization.running_var"] = rng.rand(
            out_c
        ).astype(np.float32) + 0.5

    conv_bn("conv_stem", (32, 3, 3, 3), 32)
    for k in range(13):
        cin, cout = chans[k], chans[k + 1]
        conv_bn(f"layer.{2 * k}", (cin, 1, 3, 3), cin)        # depthwise
        conv_bn(f"layer.{2 * k + 1}", (cout, cin, 1, 1), cout)  # pointwise
    return sd


def test_torch_mobilenet_v1_import(tmp_path):
    """HF MobileNetV1 state_dict → MobileNetBackbone: weights AND BatchNorm
    running stats land bit-exact, forward runs (SURVEY.md §2.3)."""
    import torch

    from bdd100k_tpu.models.mobilenet import MobileNetBackbone
    from bdd100k_tpu.utils.pretrained import import_torch_mobilenet_v1

    sd = _fake_hf_mobilenet_v1_state_dict(seed=0, prefix="mobilenet_v1.")
    path = tmp_path / "mobilenet_v1.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    model = MobileNetBackbone(width=1.0, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    merged = import_torch_mobilenet_v1(variables, path)

    # depthwise conv of block 3 (HF layer.4): (C,1,3,3) → (3,3,1,C)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["ds3"]["dw"]["Conv_0"]["kernel"]),
        np.transpose(sd["mobilenet_v1.layer.4.convolution.weight"],
                     (2, 3, 1, 0)),
    )
    # pointwise BN running stats of block 13 (HF layer.25)
    np.testing.assert_allclose(
        np.asarray(merged["batch_stats"]["ds13"]["pw"]["BatchNorm_0"]["var"]),
        sd["mobilenet_v1.layer.25.normalization.running_var"],
    )
    np.testing.assert_allclose(
        np.asarray(merged["params"]["stem"]["BatchNorm_0"]["scale"]),
        sd["mobilenet_v1.conv_stem.normalization.weight"],
    )
    taps = model.apply(merged, jnp.ones((1, 64, 64, 3)), train=False)
    assert [t.shape[-1] for t in taps] == [256, 512, 1024]


def test_torch_mobilenet_v1_into_detector():
    """Import also lands inside a full detector's variables (backbone
    subtree) without touching head params."""
    from bdd100k_tpu.utils.pretrained import convert_torch_mobilenet_v1

    sd = _fake_hf_mobilenet_v1_state_dict(seed=1)
    flat_params, flat_stats = convert_torch_mobilenet_v1(sd)
    assert "stem/Conv_0/kernel" in flat_params
    assert flat_params["ds7/pw/Conv_0/kernel"].shape == (1, 1, 512, 512)
    assert flat_stats["ds1/dw/BatchNorm_0/mean"].shape == (32,)
    assert len(flat_params) == 27 * 3  # (kernel, scale, bias) × 27 convs
    assert len(flat_stats) == 27 * 2


def test_torch_vgg16_mapping_shapes():
    """A synthetic torchvision-layout state_dict maps onto VGG16Backbone
    with exact shape agreement for every conv in conv1_1..conv5_3."""
    chans = [
        (3, 64), (64, 64),
        (64, 128), (128, 128),
        (128, 256), (256, 256), (256, 256),
        (256, 512), (512, 512), (512, 512),
        (512, 512), (512, 512), (512, 512),
    ]
    idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    rng = np.random.RandomState(0)
    sd = {}
    for i, (cin, cout) in zip(idx, chans):
        sd[f"features.{i}.weight"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32
        )
        sd[f"features.{i}.bias"] = rng.randn(cout).astype(np.float32)

    flat = convert_torch_vgg16(sd)
    model = VGG16Backbone(dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    merged = unflatten_into(variables["params"], flat)
    # every mapped conv now equals the (transposed) torch tensor
    np.testing.assert_allclose(
        merged["block3"]["conv2"]["kernel"],
        np.transpose(sd["features.12.weight"], (2, 3, 1, 0)),
    )
    assert merged["block5"]["conv3"]["bias"].shape == (512,)


def test_seed_backbone_vgg16_without_backbone_batch_stats(tmp_path):
    """ADVICE r2 (medium): VGG16 has no BatchNorm but the SSD extra layers
    do, so state.batch_stats is non-empty WITHOUT a 'backbone' key —
    train._seed_backbone must not KeyError on that shape."""
    import dataclasses

    import jax
    import numpy as np

    from bdd100k_tpu.configs import TrainConfig
    from bdd100k_tpu.configs.detector_configs import DetectorConfig
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.ops.anchors import make_ssd_feature_maps
    from bdd100k_tpu.parallel.train_step import create_train_state
    from bdd100k_tpu.train import _seed_backbone
    from bdd100k_tpu.utils.pretrained import save_params_npz

    cfg = DetectorConfig(
        name="vgg_tiny_test", image_size=64, backbone="vgg16", head="ssd",
        feature_maps=make_ssd_feature_maps(
            map_sizes=(8, 4, 2), boxes_per_map=(4, 6, 4)
        ),
    )
    bundle = build_detector(cfg)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    # the premise of the bug: non-empty batch_stats, no backbone subtree
    assert state.batch_stats and "backbone" not in state.batch_stats

    npz = tmp_path / "bb.npz"
    donor = jax.tree.map(
        lambda x: np.asarray(x) + 1.0,
        jax.device_get(state.params["backbone"]),
    )
    save_params_npz(donor, npz)
    seeded = _seed_backbone(state, cfg, str(npz))
    got = jax.device_get(
        seeded.params["backbone"]["block1"]["conv1"]["kernel"]
    )
    want = donor["block1"]["conv1"]["kernel"]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # non-backbone leaves keep their init
    assert seeded.batch_stats is state.batch_stats


def test_artifact_npz_seeds_other_head_backbone(tmp_path):
    """Cross-head transfer: a FULL detector artifact (utils/weights.py
    layout, e.g. the committed SSD300 npz) seeds a YOLO model's backbone —
    params AND BatchNorm running stats — via the same --pretrained_backbone
    npz path (pretrained.load_backbone_any_npz)."""
    from bdd100k_tpu.utils.pretrained import load_backbone_any_npz
    from bdd100k_tpu.utils.weights import save_detector_npz

    ssd = build_detector(tiny_test_config("ssd"), dtype=jnp.float32)
    donor = ssd.init(jax.random.PRNGKey(1))
    path = tmp_path / "ssd_artifact.npz"
    save_detector_npz(
        path, donor["params"], donor["batch_stats"],
        config_name="ssd_tiny_64",
    )

    yolo = build_detector(tiny_test_config("yolo"), dtype=jnp.float32)
    fresh = yolo.init(jax.random.PRNGKey(2))
    merged = load_backbone_any_npz(fresh, str(path))

    d = flatten_tree(donor["params"]["backbone"])
    m = flatten_tree(merged["params"]["backbone"])
    assert d.keys() == m.keys()
    for k in d:
        np.testing.assert_allclose(
            d[k], m[k], rtol=1e-3, atol=1e-4
        )  # fp16 artifact round-trip
    ds = flatten_tree(donor["batch_stats"]["backbone"])
    ms = flatten_tree(merged["batch_stats"]["backbone"])
    for k in ds:
        np.testing.assert_array_equal(ds[k], ms[k])  # stats stay fp32
    # head params untouched
    fh = flatten_tree(fresh["params"])
    mh = flatten_tree(merged["params"])
    for k in fh:
        if not k.startswith("backbone/"):
            np.testing.assert_array_equal(fh[k], mh[k])
