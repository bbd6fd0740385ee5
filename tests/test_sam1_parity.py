"""Numeric parity vs the reference torch SAM-v1 (vendored at
/root/reference/model/segment_anything/, imported read-only).

Builds a tiny reference `Sam` (same constructor recipe as
build_sam.py:55-103 but small dims), randomizes its weights, converts the
state dict through rga3_tpu's SAM-v1 mapping, and compares:
  * image encoder output (windowed + global rel-pos blocks, incl. the
    window pad/crop path: grid 4, window 3 -> pad to 6),
  * text-prompted mask decode (the legacy UniGR [SEG] path,
    ref model/qwen_2_5_vl.py:238-268),
  * point-prompted decode (SamPredictor-equivalent path).
Full ViT-H parity runs when RGA3_SLOW_PARITY=1 (CPU-heavy).

This is the guarantee that `sam_vit_h_4b8939.pth` loads unchanged.
"""
import importlib.util
import os
import sys
from functools import partial

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference/model/segment_anything/modeling/__init__.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference not mounted"
)


def _load_ref_modeling():
    name = "ref_sam1_modeling"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, REF,
        submodule_search_locations=[os.path.dirname(REF)],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _build_ref_sam(m, cfg):
    """Reference Sam with our tiny dims (same recipe as
    build_sam.py:55-103)."""
    return m.Sam(
        image_encoder=m.ImageEncoderViT(
            depth=cfg.depth,
            embed_dim=cfg.embed_dim,
            img_size=cfg.image_size,
            mlp_ratio=cfg.mlp_ratio,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            num_heads=cfg.num_heads,
            patch_size=cfg.patch_size,
            qkv_bias=True,
            use_rel_pos=True,
            global_attn_indexes=list(cfg.global_attn_indexes),
            window_size=cfg.window_size,
            out_chans=cfg.d_model,
        ),
        prompt_encoder=m.PromptEncoder(
            embed_dim=cfg.d_model,
            image_embedding_size=(cfg.feat_size, cfg.feat_size),
            input_image_size=(cfg.image_size, cfg.image_size),
            mask_in_chans=16,
        ),
        mask_decoder=m.MaskDecoder(
            num_multimask_outputs=cfg.num_multimask_outputs,
            transformer=m.TwoWayTransformer(
                depth=cfg.twoway_depth,
                embedding_dim=cfg.d_model,
                mlp_dim=cfg.twoway_mlp_dim,
                num_heads=cfg.twoway_heads,
            ),
            transformer_dim=cfg.d_model,
            iou_head_depth=3,
            iou_head_hidden_dim=cfg.iou_head_hidden,
        ),
        pixel_mean=[123.675, 116.28, 103.53],
        pixel_std=[58.395, 57.12, 57.375],
    ).eval()


@pytest.fixture(scope="module")
def ref_and_ours():
    from rga3_tpu.models.sam1 import Sam1Model, tiny_sam1_config
    from rga3_tpu.models.sam1.loader import convert_sam1_checkpoint

    cfg = tiny_sam1_config()
    m = _load_ref_modeling()
    torch.manual_seed(0)
    ref = _build_ref_sam(m, cfg)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.02)  # rel-pos etc. are zero-init otherwise
    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    sd = {k: v for k, v in sd.items() if not k.startswith("pixel_")}
    params = {"params": convert_sam1_checkpoint(sd, cfg)}
    model = Sam1Model(cfg)
    return ref, model, params, cfg


def test_image_encoder_parity(ref_and_ours):
    ref, model, params, cfg = ref_and_ours
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32
    )
    with torch.no_grad():
        out_t = ref.image_encoder(torch.from_numpy(img)).numpy()
    out_j = model.apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=Sam1ModelEncode,
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, rtol=2e-4, atol=2e-4
    )


def Sam1ModelEncode(m, images):
    return m.encode_image(images)


@pytest.mark.slow
@pytest.mark.midlane
def test_text_prompted_decode_parity(ref_and_ours):
    ref, model, params, cfg = ref_and_ours
    rng = np.random.default_rng(1)
    # the reference decoder takes ONE image and broadcasts it across the
    # prompt batch (mask_decoder.py:137 repeat_interleave)
    emb = rng.normal(
        size=(1, cfg.d_model, cfg.feat_size, cfg.feat_size)
    ).astype(np.float32)
    text = rng.normal(size=(2, 1, cfg.d_model)).astype(np.float32)
    with torch.no_grad():
        sparse, dense = ref.prompt_encoder(
            points=None, boxes=None, masks=None,
            text_embeds=torch.from_numpy(text),
        )
        masks_t, iou_t = ref.mask_decoder(
            image_embeddings=torch.from_numpy(emb),
            image_pe=ref.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=False,
        )
    emb_j = jnp.asarray(
        np.broadcast_to(emb, (2, *emb.shape[1:])).transpose(0, 2, 3, 1)
    )
    out = model.apply(
        params, emb_j, jnp.asarray(text),
        method=lambda m, e, t: m.decode_with_language(
            e, t, multimask_output=False
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out["low_res_masks"]), masks_t.numpy(),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["iou_predictions"]), iou_t.numpy(),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.slow
def test_point_prompted_decode_parity(ref_and_ours):
    ref, model, params, cfg = ref_and_ours
    rng = np.random.default_rng(2)
    emb = rng.normal(
        size=(1, cfg.d_model, cfg.feat_size, cfg.feat_size)
    ).astype(np.float32)
    coords = (rng.random((1, 2, 2)) * cfg.image_size).astype(np.float32)
    labels = np.array([[1, 0]], np.int32)
    with torch.no_grad():
        sparse, dense = ref.prompt_encoder(
            points=(
                torch.from_numpy(coords), torch.from_numpy(labels).long()
            ),
            boxes=None, masks=None, text_embeds=None,
        )
        masks_t, iou_t = ref.mask_decoder(
            image_embeddings=torch.from_numpy(emb),
            image_pe=ref.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=True,
        )
    out = model.apply(
        params, jnp.asarray(emb.transpose(0, 2, 3, 1)),
        jnp.asarray(coords), jnp.asarray(labels),
        method=lambda m, e, c, l: m.decode_with_prompts(
            e, point_coords=c, point_labels=l, multimask_output=True
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out["low_res_masks"]), masks_t.numpy(),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["iou_predictions"]), iou_t.numpy(),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.skipif(
    os.environ.get("RGA3_SLOW_PARITY") != "1",
    reason="full ViT-H parity is CPU-heavy; RGA3_SLOW_PARITY=1 enables",
)
def test_vit_h_full_parity():
    from rga3_tpu.models.sam1 import SAM1_VIT_H, Sam1Model
    from rga3_tpu.models.sam1.loader import convert_sam1_checkpoint

    cfg = SAM1_VIT_H
    m = _load_ref_modeling()
    torch.manual_seed(0)
    ref = _build_ref_sam(m, cfg)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.02)
    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()
          if not k.startswith("pixel_")}
    params = {"params": convert_sam1_checkpoint(sd, cfg)}
    model = Sam1Model(cfg)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 1024, 1024)).astype(np.float32)
    with torch.no_grad():
        out_t = ref.image_encoder(torch.from_numpy(img)).numpy()
    out_j = model.apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=lambda mm, x: mm.encode_image(x),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, rtol=5e-3, atol=5e-3
    )


@pytest.mark.slow
def test_batch_scanned_global_attention_matches_per_sample():
    """The lax.map batch scan (memory-bounding path for >=1024-token
    global blocks) must match unscanned per-sample attention."""
    from rga3_tpu.models.sam1.config import tiny_sam1_config
    from rga3_tpu.models.sam1.vit import Sam1Attention

    cfg = tiny_sam1_config()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 32)).astype(np.float32))
    attn = Sam1Attention(cfg, input_size=32)
    p = attn.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(
        lambda a: jnp.asarray(
            rng.normal(size=a.shape, scale=0.05).astype(np.float32)
        ),
        p,
    )
    out_mapped = attn.apply(p, x)
    out_single = jnp.concatenate(
        [attn.apply(p, x[i : i + 1]) for i in range(2)], 0
    )
    np.testing.assert_allclose(
        np.asarray(out_mapped), np.asarray(out_single), rtol=1e-5, atol=1e-5
    )
