"""Numeric parity vs the reference torch SAM2 (vendored at
/root/reference/model/sam2.py, imported read-only).

Random-initializes the reference's full SAM2 build, converts its
state_dict through rga3_tpu's checkpoint mapping, and compares:
  * prompt encoder sparse/dense embeddings,
  * mask decoder (language-prompted _forward_sam_heads, the UniGR path),
  * memory encoder features,
at the real Hiera-L head dims (d_model 256, 64x64 feature grid). The full
1024^2 trunk parity runs when RGA3_SLOW_PARITY=1 (CPU-heavy).

This is the guarantee that `sam2_hiera_large.pt` loads unchanged.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference/model/sam2.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_and_ours():
    spec = importlib.util.spec_from_file_location("refsam2", REF)
    refmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refmod)
    torch.manual_seed(0)
    ref = refmod.SAM2(ckpt_path=None).sam2_model.eval()

    from rga3_tpu.models.sam2 import SAM2_HIERA_L
    from rga3_tpu.models.sam2.loader import convert_sam2_checkpoint
    from rga3_tpu.models.sam2.model import Sam2Model

    sd = {
        k.replace(".gamma", ".g_weight"): v.float().numpy()
        for k, v in ref.state_dict().items()
    }
    params = {"params": convert_sam2_checkpoint(sd)}
    model = Sam2Model(SAM2_HIERA_L)
    return refmod, ref, model, params


def test_prompt_encoder_parity(ref_and_ours):
    refmod, ref, model, params = ref_and_ours
    with torch.no_grad():
        sparse_t, dense_t = ref.sam_prompt_encoder(
            points=(
                torch.zeros(1, 1, 2),
                -torch.ones(1, 1, dtype=torch.int32),
            ),
            boxes=None, masks=None,
        )
        pe_t = ref.sam_prompt_encoder.get_dense_pe()
    sparse_j, dense_j = model.apply(
        params, batch=1,
        method=lambda m, batch: m.sam_prompt_encoder(batch=batch),
    )
    np.testing.assert_allclose(
        np.asarray(sparse_j), sparse_t.detach().numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dense_j).transpose(0, 3, 1, 2), dense_t.detach().numpy(),
        rtol=1e-4, atol=1e-4,
    )
    pe_j = model.apply(
        params, method=lambda m: m.sam_prompt_encoder.dense_pe()
    )
    np.testing.assert_allclose(
        np.asarray(pe_j).transpose(2, 0, 1), pe_t[0].detach().numpy(),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.slow
@pytest.mark.midlane
def test_language_mask_decoder_parity(ref_and_ours):
    refmod, ref, model, params = ref_and_ours
    rng = np.random.default_rng(0)
    s = 64
    feats = rng.normal(0, 0.5, (1, 256, s, s)).astype(np.float32)
    s0 = rng.normal(0, 0.5, (1, 32, 4 * s, 4 * s)).astype(np.float32)
    s1 = rng.normal(0, 0.5, (1, 64, 2 * s, 2 * s)).astype(np.float32)
    lang = rng.normal(0, 0.5, (1, 1, 256)).astype(np.float32)

    with torch.no_grad():
        out_t = ref._forward_sam_heads(
            backbone_features=torch.tensor(feats),
            point_inputs=None,
            mask_inputs=None,
            high_res_features=[torch.tensor(s0), torch.tensor(s1)],
            multimask_output=True,
            language_embd=torch.tensor(lang),
        )
    low_t, high_t = out_t[3].detach().numpy(), out_t[4].detach().numpy()
    obj_ptr_t = out_t[5].detach().numpy()

    out_j = model.apply(
        params,
        jnp.asarray(feats.transpose(0, 2, 3, 1)),
        (
            jnp.asarray(s0.transpose(0, 2, 3, 1)),
            jnp.asarray(s1.transpose(0, 2, 3, 1)),
        ),
        jnp.asarray(lang),
        method=lambda m, f, hr, le: m.forward_sam_heads(
            f, hr, language_embd=le, multimask_output=True
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out_j["low_res_masks"]), low_t, rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_j["high_res_masks"]), high_t, rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_j["obj_ptr"]), obj_ptr_t, rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_memory_encoder_parity(ref_and_ours):
    refmod, ref, model, params = ref_and_ours
    rng = np.random.default_rng(1)
    s = 64
    pix = rng.normal(0, 0.5, (1, 256, s, s)).astype(np.float32)
    masks = rng.normal(0, 2.0, (1, 1, 16 * s, 16 * s)).astype(np.float32)
    with torch.no_grad():
        out_t = ref.memory_encoder(
            torch.tensor(pix), torch.sigmoid(torch.tensor(masks)),
            skip_mask_sigmoid=True,
        )
    feats_j, pos_j = model.apply(
        params,
        jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jax.nn.sigmoid(jnp.asarray(masks.transpose(0, 2, 3, 1))),
        True,
        method=lambda m, p, mk, skip: m.memory_encoder(
            p, mk, skip_mask_sigmoid=skip
        ),
    )
    np.testing.assert_allclose(
        np.asarray(feats_j).transpose(0, 3, 1, 2),
        out_t["vision_features"].detach().numpy(), rtol=2e-3, atol=2e-3,
    )


@pytest.mark.skipif(
    os.environ.get("RGA3_SLOW_PARITY") != "1",
    reason="CPU-heavy full-trunk parity; set RGA3_SLOW_PARITY=1",
)
def test_full_image_encoder_parity(ref_and_ours):
    refmod, ref, model, params = ref_and_ours
    rng = np.random.default_rng(2)
    img = rng.normal(0, 1.0, (1, 3, 1024, 1024)).astype(np.float32)
    with torch.no_grad():
        out_t = ref.forward_image(torch.tensor(img))
    out_j = model.apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=type(model).forward_image,
    )
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(out_j["backbone_fpn"][lvl]).transpose(0, 3, 1, 2),
            out_t["backbone_fpn"][lvl].detach().numpy(),
            rtol=5e-3, atol=5e-3,
        )
