"""int8 post-training quantization path (models/layers.py QuantConv).

Contract: (1) param trees are IDENTICAL to the f32 model, so any trained
checkpoint restores unchanged into a quantized model; (2) QuantConv output
tracks nn.Conv within dynamic-int8 tolerance; (3) the full detector runs
end-to-end quantized and produces detections close to the f32 model's.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.configs.detector_configs import tiny_test_config
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.models.layers import QuantConv

import flax.linen as nn


def test_quantconv_matches_conv_params_and_output():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8), jnp.float32)
    ref = nn.Conv(12, (3, 3), padding="SAME", dtype=jnp.float32,
                  param_dtype=jnp.float32)
    qc = QuantConv(features=12, kernel_size=(3, 3), dtype=jnp.float32)
    vr = ref.init(rng, x)
    vq = qc.init(rng, x)
    # identical param structure AND identical initial values (same init fns)
    assert jax.tree.structure(vr) == jax.tree.structure(vq)
    for a, b in zip(jax.tree.leaves(vr), jax.tree.leaves(vq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_r = ref.apply(vr, x)
    out_q = qc.apply(vr, x)  # f32 params into the quantized module
    # dynamic int8: ~1% relative error on well-scaled activations
    err = jnp.linalg.norm(out_q - out_r) / jnp.linalg.norm(out_r)
    assert float(err) < 0.02, float(err)


def test_quantconv_dilation_and_stride_shapes():
    x = jnp.ones((1, 32, 32, 4))
    v = QuantConv(features=8, kernel_size=(3, 3), kernel_dilation=(6, 6),
                  ).init(jax.random.PRNGKey(0), x)
    out = QuantConv(features=8, kernel_size=(3, 3),
                    kernel_dilation=(6, 6)).apply(v, x)
    assert out.shape == (1, 32, 32, 8)
    out = QuantConv(features=8, kernel_size=(3, 3),
                    strides=(2, 2)).apply(v, x)
    assert out.shape == (1, 16, 16, 8)


@pytest.mark.parametrize("head", ["ssd", "yolo"])
def test_quantized_detector_checkpoint_compatible(head):
    """quant='int8' must not change the param tree (checkpoints
    interchangeable) and must produce detections close to f32's."""
    cfg = tiny_test_config(head)
    cfg_q = dataclasses.replace(cfg, quant="int8")
    bundle = build_detector(cfg, dtype=jnp.float32)
    bundle_q = build_detector(cfg_q, dtype=jnp.float32)

    rng = jax.random.PRNGKey(0)
    s = cfg.image_size
    img = jax.random.randint(
        jax.random.PRNGKey(2), (2, s, s, 3), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    x = img.astype(jnp.float32) / 255.0
    vars_f = bundle.model.init(rng, x, train=False)
    vars_q = bundle_q.model.init(rng, x, train=False)
    assert jax.tree.structure(vars_f) == jax.tree.structure(vars_q)

    loc_f, cls_f = bundle.model.apply(vars_f, x, train=False)
    loc_q, cls_q = bundle_q.model.apply(vars_f, x, train=False)  # same params
    assert loc_q.shape == loc_f.shape and cls_q.shape == cls_f.shape
    # random-init logits through few layers: int8 tracks f32 closely
    rel = float(
        jnp.linalg.norm(cls_q - cls_f) / (jnp.linalg.norm(cls_f) + 1e-9)
    )
    assert rel < 0.1, rel


def test_quantized_eval_cli(tmp_path):
    from bdd100k_tpu import evaluate as eval_mod

    result = eval_mod.main([
        "--config", "ssd_tiny_64", "--synthetic", "8",
        "--synthetic_dir", str(tmp_path / "synth"),
        "--batch_size", "8", "--max_boxes", "16", "--quant", "int8",
    ])
    assert 0.0 <= result["mAP"] <= 1.0
    assert result["num_images"] == 8


def test_static_quant_matches_dynamic_on_calibration_batch():
    """int8_static calibrated on batch X must reproduce dynamic int8's
    output ON X: layer by layer the frozen running-max amax equals the
    amax dynamic int8 derives from the same activations."""
    from bdd100k_tpu.models.quant import calibrate, init_quant_vars

    cfg = tiny_test_config("ssd")
    bundle_dyn = build_detector(
        dataclasses.replace(cfg, quant="int8"), dtype=jnp.float32
    )
    bundle_st = build_detector(
        dataclasses.replace(cfg, quant="int8_static"), dtype=jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    s = cfg.image_size
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, s, s, 3), jnp.float32)
    vars_dyn = bundle_dyn.model.init(rng, x, train=False)
    # same rng → identical params; the static model adds only a separate
    # "quant" collection (the params tree stays checkpoint-compatible)
    vars_st = bundle_st.model.init(rng, x, train=False)
    assert jax.tree.structure(vars_dyn["params"]) == jax.tree.structure(
        vars_st["params"]
    )
    q0 = init_quant_vars(bundle_st)
    assert q0 is not None
    for leaf in jax.tree.leaves(q0):
        assert leaf.shape == () and leaf.dtype == jnp.float32

    qv = calibrate(
        bundle_st, vars_dyn["params"], vars_dyn.get("batch_stats", {}), [x]
    )
    # every calibrated amax is positive (real activations flowed through)
    assert all(float(a) > 0 for a in jax.tree.leaves(qv))

    loc_d, cls_d = bundle_dyn.model.apply(
        {k: vars_dyn[k] for k in ("params", "batch_stats") if k in vars_dyn},
        x, train=False,
    )
    st_vars = {
        k: vars_dyn[k] for k in ("params", "batch_stats") if k in vars_dyn
    }
    st_vars["quant"] = qv
    loc_s, cls_s = bundle_st.model.apply(st_vars, x, train=False)
    np.testing.assert_allclose(
        np.asarray(loc_s), np.asarray(loc_d), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cls_s), np.asarray(cls_d), rtol=1e-5, atol=1e-5
    )


def test_static_quant_bf16_epilogue_tracks_fp32():
    """The bf16 fast path (quantize in the input dtype against a frozen
    reciprocal scale, models/layers.py) must track the fp32 static path
    within int8-noise: the bf16 multiply rounds at most ~1 int8 LSB."""
    qc32 = QuantConv(features=12, kernel_size=(3, 3), dtype=jnp.float32,
                     static_act=True)
    qc16 = QuantConv(features=12, kernel_size=(3, 3), dtype=jnp.bfloat16,
                     static_act=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8), jnp.float32)
    v = qc32.init(jax.random.PRNGKey(0), x)
    # calibrate: one mutable-"quant" pass records the running amax
    _, cal = qc32.apply(v, x, mutable=["quant"])
    v = {"params": v["params"], "quant": cal["quant"]}
    assert float(jax.tree.leaves(cal["quant"])[0]) > 0
    out32 = qc32.apply(v, x)
    out16 = qc16.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32)
    rel = float(jnp.linalg.norm(out16 - out32) / jnp.linalg.norm(out32))
    assert rel < 0.03, rel
    # the frozen-scale quantize must not silently widen: same int8 grid,
    # so the two paths agree elementwise within a few dequant steps
    grid = float(jax.tree.leaves(cal["quant"])[0]) / 127.0
    w_amax = float(jnp.max(jnp.abs(v["params"]["kernel"])))
    assert float(jnp.max(jnp.abs(out16 - out32))) < 40 * grid * w_amax


def test_static_quant_eval_cli(tmp_path):
    from bdd100k_tpu import evaluate as eval_mod

    result = eval_mod.main([
        "--config", "ssd_tiny_64", "--synthetic", "8",
        "--synthetic_dir", str(tmp_path / "synth"),
        "--batch_size", "8", "--max_boxes", "16",
        "--quant", "int8_static", "--calib_batches", "1",
    ])
    assert 0.0 <= result["mAP"] <= 1.0
    assert result["num_images"] == 8


def test_calibrate_rejects_zero_batches():
    from bdd100k_tpu.models.quant import calibrate

    cfg = dataclasses.replace(tiny_test_config("ssd"), quant="int8_static")
    bundle = build_detector(cfg, dtype=jnp.float32)
    s = cfg.image_size
    v = bundle.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)), train=False
    )
    with pytest.raises(ValueError, match="zero batches"):
        calibrate(bundle, v["params"], v.get("batch_stats", {}), [])


def test_quantized_vgg16_backbone_tracks_f32():
    """VGG16 is the int8 target (MXU-bound); its quant path — plain conv
    blocks + the dilated fc6 — must keep the param tree and track f32."""
    from bdd100k_tpu.models.vgg import VGG16Backbone

    bb_f = VGG16Backbone(dtype=jnp.float32)
    bb_q = VGG16Backbone(dtype=jnp.float32, quant="int8")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3), jnp.float32)
    vf = bb_f.init(jax.random.PRNGKey(0), x)
    vq = bb_q.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(vf) == jax.tree.structure(vq)
    taps_f = bb_f.apply(vf, x)
    taps_q = bb_q.apply(vf, x)
    for tf_, tq in zip(taps_f, taps_q):
        assert tf_.shape == tq.shape
        rel = float(jnp.linalg.norm(tq - tf_) / (jnp.linalg.norm(tf_) + 1e-9))
        assert rel < 0.15, rel


def test_calibration_batches_share_one_shape():
    """Partial trailing batch is padded (running-max: duplicates cannot
    change scales) so every calib_step hits one compiled shape."""
    from bdd100k_tpu.models.quant import calibration_batches_from_dataset

    class _DS:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return {"image": np.full((8, 8, 3), i, np.uint8)}

    batches = calibration_batches_from_dataset(_DS(), batch_size=4,
                                               num_batches=4)
    assert [b.shape for b in batches] == [(4, 8, 8, 3)] * 3
    # padded tail repeats the last real image
    np.testing.assert_array_equal(batches[2][2], batches[2][3])


def test_calibration_batches_from_images(tmp_path):
    from PIL import Image

    from bdd100k_tpu.models.quant import calibration_batches_from_images

    for i in range(5):
        Image.fromarray(
            np.full((32, 48, 3), i * 10, np.uint8)
        ).save(tmp_path / f"f{i}.jpg")
    batches = calibration_batches_from_images(tmp_path, image_size=16,
                                              batch_size=4)
    assert [b.shape for b in batches] == [(4, 16, 16, 3)] * 2
    np.testing.assert_array_equal(batches[1][1], batches[1][3])


def test_emit_int8_single_conv_codes_and_scale():
    """QuantConv(emit_int8=True) at inference returns Int8Act whose
    dequantized codes equal relu(float-path output) within one int8 grid
    step, with ReLU folded as the clip floor (codes in [0, 127])."""
    from bdd100k_tpu.models.layers import Int8Act

    qc = QuantConv(features=12, kernel_size=(3, 3), dtype=jnp.float32,
                   static_act=True, emit_int8=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8), jnp.float32)
    v = qc.init(jax.random.PRNGKey(0), x)
    # calibration pass is float and populates BOTH running maxes
    out_cal, muts = qc.apply(v, x, mutable=["quant"])
    assert not isinstance(out_cal, Int8Act)
    qv = muts["quant"]
    assert float(qv["act_amax"]) > 0 and float(qv["out_amax"]) > 0
    # frozen pass emits codes
    out = qc.apply({"params": v["params"], "quant": qv}, x)
    assert isinstance(out, Int8Act)
    assert out.codes.dtype == jnp.int8
    assert int(jnp.min(out.codes)) >= 0 and int(jnp.max(out.codes)) <= 127
    deq = out.codes.astype(jnp.float32) * out.scale
    ref = nn.relu(out_cal)
    grid = float(out.scale)
    assert float(jnp.max(jnp.abs(deq - ref))) <= 1.01 * grid


def test_emit_int8_chain_matches_float_chain():
    """conv(emit)→[pool on codes]→conv must track the same two-conv chain
    run layer-by-layer in float (the pre-pipeline int8_static semantics)
    within int8-noise: the pipeline only removes intermediate roundings."""
    from bdd100k_tpu.models.layers import max_pool_q

    class Chain(nn.Module):
        emit: bool

        @nn.compact
        def __call__(self, x):
            x = QuantConv(features=16, kernel_size=(3, 3),
                          dtype=jnp.float32, static_act=True,
                          emit_int8=self.emit, name="c1")(x)
            x = nn.relu(x) if not self.emit else x
            x = max_pool_q(x, (2, 2), strides=(2, 2))
            x = QuantConv(features=8, kernel_size=(3, 3),
                          dtype=jnp.float32, static_act=True,
                          name="c2")(x)
            return x

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4), jnp.float32)
    pipe, flat = Chain(emit=True), Chain(emit=False)
    v = pipe.init(jax.random.PRNGKey(0), x)
    _, muts = pipe.apply(v, x, mutable=["quant"])
    qv = muts["quant"]
    out_p = pipe.apply({"params": v["params"], "quant": qv}, x)
    # the float chain reuses the same calibrated act scales (out_amax is
    # simply unused there)
    out_f = flat.apply({"params": v["params"], "quant": qv}, x)
    rel = float(jnp.linalg.norm(out_p - out_f) /
                (jnp.linalg.norm(out_f) + 1e-9))
    assert rel < 0.02, rel


def test_vgg_static_pipeline_tracks_dynamic():
    """The full VGG16 int8_static requant pipeline (11 emitting convs,
    pools on codes, taps dequantized) must track dynamic int8 as closely
    as plain f32-roundtrip static did — the epilogue change removes HBM
    traffic, not accuracy. Also pins the emit-layer count so a backbone
    edit that silently drops the pipeline fails here."""
    import flax

    from bdd100k_tpu.models.vgg import VGG16Backbone

    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3),
                           jnp.float32)
    bb_f = VGG16Backbone(dtype=jnp.float32)
    bb_s = VGG16Backbone(dtype=jnp.float32, quant="int8_static")
    bb_d = VGG16Backbone(dtype=jnp.float32, quant="int8")
    vf = bb_f.init(jax.random.PRNGKey(0), x)
    vs = bb_s.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(vf["params"]) == jax.tree.structure(
        vs["params"]
    )
    _, muts = bb_s.apply(
        {"params": vf["params"], "quant": vs["quant"]}, x, mutable=["quant"]
    )
    qv = muts["quant"]
    flat = flax.traverse_util.flatten_dict(qv)
    out_leaves = {k: float(v) for k, v in flat.items() if k[-1] == "out_amax"}
    assert len(out_leaves) == 11, sorted(out_leaves)  # 2+3+2+3+1 emitters
    assert all(v > 0 for v in out_leaves.values())
    taps_f = bb_f.apply(vf, x)
    taps_s = bb_s.apply({"params": vf["params"], "quant": qv}, x)
    taps_d = bb_d.apply({"params": vf["params"]}, x)
    for tf_, ts, td in zip(taps_f, taps_s, taps_d):
        rel_s = float(jnp.linalg.norm(ts - tf_) /
                      (jnp.linalg.norm(tf_) + 1e-9))
        rel_d = float(jnp.linalg.norm(td - tf_) /
                      (jnp.linalg.norm(tf_) + 1e-9))
        # static pipeline may not degrade on dynamic by more than a hair
        assert rel_s < rel_d + 0.005, (rel_s, rel_d)
