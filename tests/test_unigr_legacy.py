"""Legacy UniGR composite (SAM-v1 backbone): losses, eval step, grads
(ref: model/qwen_2_5_vl.py:94-412)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.config import SegHeadConfig
from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.sam1 import tiny_sam1_config
from rga3_tpu.models.unigr.legacy import UniGRLegacy, UniGRLegacyConfig

SEG_ID = 151998


@pytest.fixture(scope="module")
def legacy():
    qcfg = tiny_config(vocab_size=152_000)
    scfg = tiny_sam1_config(image_size=64)
    cfg = UniGRLegacyConfig(
        qwen=qcfg,
        sam1=scfg,
        seg=SegHeadConfig(out_dim=scfg.d_model, seg_token_id=SEG_ID,
                          ce_loss_weight=1.0, bce_loss_weight=2.0,
                          dice_loss_weight=0.5),
    )
    model = UniGRLegacy(cfg)
    rng = np.random.default_rng(0)
    B, L, T = 2, 10, 2
    ids = rng.integers(0, 1000, size=(B, L)).astype(np.int32)
    ids[:, 6] = SEG_ID
    images = jnp.asarray(rng.normal(size=(T, 64, 64, 3)).astype(np.float32))
    lang = jnp.asarray(
        rng.normal(size=(T, 1, scfg.d_model)).astype(np.float32)
    )
    params = model.init(
        jax.random.PRNGKey(0), images, lang, jnp.asarray(ids)
    )
    return cfg, model, params, ids


def _train_inputs(ids, seed=1):
    rng = np.random.default_rng(seed)
    B, L, T = 2, 10, 2
    labels = ids.copy()
    labels[:, :4] = -100
    pos = np.broadcast_to(np.arange(L)[None, None], (3, B, L)).copy()
    images_sam = jnp.asarray(
        rng.normal(size=(B, T, 64, 64, 3)).astype(np.float32)
    )
    gt = jnp.asarray((rng.random((B, T, 48, 56)) > 0.5).astype(np.float32))
    return labels, pos, images_sam, gt


@pytest.mark.slow
def test_train_forward_losses(legacy):
    cfg, model, params, ids = legacy
    labels, pos, images_sam, gt = _train_inputs(ids)
    out = model.apply(
        params,
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(pos), None,
        images_sam, gt, jnp.ones((2,)),
        compute_dtype=jnp.float32,
        method=UniGRLegacy.train_forward,
    )
    for k in ["loss", "ce_loss", "mask_bce_loss", "mask_dice_loss"]:
        assert np.isfinite(float(out[k])), k
    assert float(out["loss"]) > 0


@pytest.mark.slow
def test_no_seg_sample_zero_mask_loss(legacy):
    cfg, model, params, ids = legacy
    ids2 = ids.copy()
    ids2[:, 6] = 5
    labels, pos, images_sam, gt = _train_inputs(ids2, seed=2)
    out = model.apply(
        params,
        jnp.asarray(ids2), jnp.asarray(ids2.copy()), jnp.asarray(pos), None,
        images_sam, gt, jnp.ones((2,)),
        compute_dtype=jnp.float32,
        method=UniGRLegacy.train_forward,
    )
    assert abs(float(out["mask_loss"])) < 1e-6


@pytest.mark.slow
def test_train_forward_is_differentiable(legacy):
    cfg, model, params, ids = legacy
    labels, pos, images_sam, gt = _train_inputs(ids, seed=3)

    def loss_fn(p):
        out = model.apply(
            p,
            jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(pos), None,
            images_sam, gt, jnp.ones((2,)),
            compute_dtype=jnp.float32,
            method=UniGRLegacy.train_forward,
        )
        return out["loss"]

    grads = jax.grad(loss_fn)(params)
    gproj = grads["params"]["text_hidden_fcs"]["fc1"]["kernel"]
    assert float(jnp.abs(gproj).sum()) > 0
    # SAM-v1 decoder receives gradient through the language prompt
    gdec = grads["params"]["sam_model"]["mask_decoder"]["iou_token"][
        "embedding"
    ]
    assert np.all(np.isfinite(np.asarray(gdec)))


@pytest.mark.slow
def test_evaluate_step(legacy):
    cfg, model, params, ids = legacy
    T, L = 3, 10
    pos = np.broadcast_to(np.arange(L)[None, None], (3, 1, L)).copy()
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.normal(size=(T, 64, 64, 3)).astype(np.float32))
    out = model.apply(
        params,
        jnp.asarray(ids[:1]), jnp.asarray(pos), frames,
        compute_dtype=jnp.float32,
        method=UniGRLegacy.evaluate_step,
    )
    s4 = 4 * cfg.sam1.feat_size
    assert out["low_res_masks"].shape == (T, 1, s4, s4)
    assert bool(out["has_seg"][0])
