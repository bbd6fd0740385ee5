"""Int8 weight-only quantization: op accuracy, tree transform, and the
quantized LM end-to-end (ref bitsandbytes path: inference_mevis.py:70-93)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.language import QwenForCausalLM, make_kv_cache
from rga3_tpu.ops.quant import (
    dequantize_qwen_params, int4_matmul, int8_matmul, quantize_int4,
    quantize_int8, quantize_qwen_params,
)


def test_quantize_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    q, scale = quantize_int8(w)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * scale[None, :]
    # symmetric 127-step quantization: error bounded by scale/2 per entry
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(scale)[None, :] / 2 + 1e-7
    assert (err <= bound).all()


def test_int8_matmul_close_to_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    q, scale = quantize_int8(w)
    ref = x @ w
    out = int8_matmul(x, q, scale)
    rel = float(
        jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-9)
    )
    assert rel < 0.01, rel


def test_int8_w8a8_matmul_close_to_dense():
    from rga3_tpu.ops.quant import int8_w8a8_matmul

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 40, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    q, scale = quantize_int8(w)
    ref = np.asarray(x @ w)
    out = np.asarray(int8_w8a8_matmul(x, q, scale))
    rel = float(np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9))
    # weight quant (~0.5%) + per-token activation quant (~0.5%)
    assert rel < 0.02, rel


def test_w8a8_prefill_matches_weight_only_tokens():
    """quant_w8a8 changes prefill math only: greedy tokens must match
    the weight-only int8 path on the tiny model, and the decode steps
    (L=1) must bypass activation quantization entirely."""
    import jax
    from rga3_tpu.models.qwen25vl import tiny_config
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.generate import greedy_generate
    from rga3_tpu.models.qwen25vl.positions import get_rope_index
    from rga3_tpu.ops.quant import quantize_qwen_params

    cfg = tiny_config(vocab_size=300)
    ids = np.random.default_rng(0).integers(0, 300, (2, 40)).astype(np.int32)
    base = Qwen25VL(cfg)
    params = base.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(ids))
    qparams = {"params": quantize_qwen_params(params["params"])}
    pos, deltas = get_rope_index(cfg, ids)
    kw = dict(max_new_tokens=5, eos_token_id=10_000, pad_token_id=0,
              compute_dtype=jnp.float32)
    args = (jnp.asarray(ids), jnp.ones((2, 40), jnp.int32),
            jnp.asarray(pos), jnp.asarray(deltas))
    m_int8 = Qwen25VL(cfg.replace(text=cfg.text.replace(quant_int8=True)))
    ref = np.asarray(greedy_generate(m_int8, qparams, *args, **kw))
    m_w8a8 = Qwen25VL(cfg.replace(text=cfg.text.replace(
        quant_int8=True, quant_w8a8=True)))
    got = np.asarray(greedy_generate(m_w8a8, qparams, *args, **kw))
    np.testing.assert_array_equal(got, ref)


def test_quantize_int4_roundtrip_error():
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(256, 48)).astype(np.float32))
    q4, sg = quantize_int4(w)
    assert q4.dtype == jnp.int8 and q4.shape == (128, 48)
    assert sg.shape == (8, 48)  # group 32 along the input dim
    deq = dequantize_qwen_params(
        {"q_proj": {"kernel_q4": q4, "scale_g": sg}}
    )["q_proj"]["kernel"]
    # symmetric 7-step: error bounded by group scale / 2
    err = np.abs(np.asarray(deq) - np.asarray(w))
    bound = np.repeat(np.asarray(sg), 32, axis=0) / 2 + 1e-7
    assert (err <= bound).all()


def test_int4_matmul_matches_dequantized_dense():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 48)).astype(np.float32))
    q4, sg = quantize_int4(w)
    deq = dequantize_qwen_params(
        {"q_proj": {"kernel_q4": q4, "scale_g": sg}}
    )["q_proj"]["kernel"]
    ref = x @ jnp.asarray(deq)
    out = int4_matmul(x, q4, sg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    # and quantization keeps the matmul near the fp result (int4 RTN on
    # Gaussian weights: ~9% at group 32 — the worst case; real LLM
    # weights fare better per published Q4_0 results)
    rel = float(jnp.linalg.norm(out - x @ w) / jnp.linalg.norm(x @ w))
    assert rel < 0.10, rel


def test_int4_exact_on_representable_weights():
    # weights that are exact multiples of the group scale roundtrip exactly
    rng = np.random.default_rng(9)
    ints = rng.integers(-7, 8, size=(128, 32)).astype(np.float32)
    ints[0::32, :] = 7  # every scale group sees amax 7 -> scale 1/7
    w = jnp.asarray(ints / 7.0)  # exact grid
    q4, sg = quantize_int4(w)
    deq = dequantize_qwen_params(
        {"q_proj": {"kernel_q4": q4, "scale_g": sg}}
    )["q_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=1e-7)


@pytest.mark.slow
def test_int4_lm_decode_end_to_end():
    cfg = tiny_config(vocab_size=1000).text.replace(
        scan_layers=True, quant_int4=True
    )
    fp_cfg = cfg.replace(quant_int4=False)
    fp = QwenForCausalLM(fp_cfg)
    qm = QwenForCausalLM(cfg)
    rng = np.random.default_rng(10)
    ids = jnp.asarray(rng.integers(0, 1000, (1, 8)), jnp.int32)
    params = fp.init(jax.random.PRNGKey(4), input_ids=ids)
    qparams = {"params": quantize_qwen_params(params["params"], bits=4)}

    out_fp = fp.apply(params, input_ids=ids)["logits"]
    cache = make_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    out = qm.apply(qparams, input_ids=ids, cache=cache)
    rel = float(
        jnp.linalg.norm(out["logits"] - out_fp)
        / (jnp.linalg.norm(out_fp) + 1e-9)
    )
    # ~9% per-matmul int4 error compounds through the layer stack of a
    # RANDOM-init net (measured ~0.31 here); the tight numeric contracts
    # live in the per-op tests above. This pins mechanics + sanity.
    assert rel < 0.5, rel
    tok = jnp.argmax(out["logits"][:, -1], -1)
    out2 = qm.apply(qparams, input_ids=tok[:, None], cache=out["cache"])
    assert out2["logits"].shape == (1, 1, 1000)
    assert int(out2["cache"]["idx"]) == 9


@pytest.mark.slow
def test_quantized_tree_and_lm_forward():
    cfg = tiny_config(vocab_size=1000).text
    fp = QwenForCausalLM(cfg)
    qm = QwenForCausalLM(cfg.replace(quant_int8=True))
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 1000, (2, 12)), jnp.int32)
    params = fp.init(jax.random.PRNGKey(0), input_ids=ids)
    qparams = jax.tree.map(lambda x: x, params)
    qparams = {"params": quantize_qwen_params(params["params"])}

    out_fp = fp.apply(params, input_ids=ids)["logits"]
    out_q = qm.apply(qparams, input_ids=ids)["logits"]
    # weight-only int8 keeps logits close (random tiny model, fp32 acts)
    rel = float(
        jnp.linalg.norm(out_q - out_fp) / (jnp.linalg.norm(out_fp) + 1e-9)
    )
    assert rel < 0.05, rel
    # greedy next-token choice is preserved on a clear-margin position
    fp_tok = np.asarray(jnp.argmax(out_fp[:, -1], -1))
    q_tok = np.asarray(jnp.argmax(out_q[:, -1], -1))
    assert (fp_tok == q_tok).mean() >= 0.5

    # dequantize roundtrip restores tree structure
    deq = dequantize_qwen_params(qparams["params"])
    k = deq["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    from flax.core import meta

    k0 = meta.unbox(params)["params"]["model"]["layers_0"]["self_attn"][
        "q_proj"
    ]["kernel"]
    rel = np.linalg.norm(k - np.asarray(k0)) / np.linalg.norm(
        np.asarray(k0)
    )
    assert rel < 0.01


@pytest.mark.slow
def test_quantized_scan_layers_decode():
    cfg = tiny_config(vocab_size=1000).text.replace(
        scan_layers=True, quant_int8=True
    )
    fp_cfg = cfg.replace(quant_int8=False)
    fp = QwenForCausalLM(fp_cfg)
    qm = QwenForCausalLM(cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 1000, (1, 8)), jnp.int32)
    params = fp.init(jax.random.PRNGKey(1), input_ids=ids)
    qparams = {"params": quantize_qwen_params(params["params"])}

    cache = make_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    out = qm.apply(qparams, input_ids=ids, cache=cache)
    tok = jnp.argmax(out["logits"][:, -1], -1)
    out2 = qm.apply(
        qparams, input_ids=tok[:, None], cache=out["cache"]
    )
    assert out2["logits"].shape == (1, 1, 1000)
    assert int(out2["cache"]["idx"]) == 9


@pytest.mark.slow
def test_vision_tower_int8():
    """include_vision quantizes the ViT blocks too; logits on a vision
    prompt stay close and the tree holds int8 vision kernels."""
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.vision import (
        compute_vision_layout, layout_device_args,
    )

    cfg = tiny_config(vocab_size=1000)
    qcfg = cfg.replace(
        text=cfg.text.replace(quant_int8=True),
        vision=cfg.vision.replace(quant_int8=True),
    )
    fp = Qwen25VL(cfg)
    qm = Qwen25VL(qcfg)
    rng = np.random.default_rng(5)

    vcfg = cfg.vision
    grid = (1, 4, 4)
    n_patches = 16
    layout = compute_vision_layout([grid], vcfg)
    la = layout_device_args(layout, vcfg)
    patches = jnp.asarray(
        rng.normal(
            size=(n_patches,
                  3 * vcfg.temporal_patch_size * vcfg.patch_size**2)
        ).astype(np.float32)
    )
    from rga3_tpu.models.qwen25vl.config import IMAGE_PAD_TOKEN_ID

    ids = rng.integers(1, 900, (1, 12)).astype(np.int32)
    ids[0, 3:7] = IMAGE_PAD_TOKEN_ID  # 16 patches -> 4 merged tokens
    ids = jnp.asarray(ids)

    params = fp.init(
        jax.random.PRNGKey(0), input_ids=ids, pixel_patches=patches,
        vision_layout=la,
    )
    qparams = {
        "params": quantize_qwen_params(
            params["params"], include_vision=True
        )
    }
    blocks = qparams["params"]["visual"]
    # find an int8 vision kernel
    flat = jax.tree_util.tree_leaves_with_path(blocks)
    assert any(
        "kernel_q" in jax.tree_util.keystr(k) for k, _ in flat
    )

    out_fp = fp.apply(
        params, input_ids=ids, pixel_patches=patches, vision_layout=la
    )["logits"]
    out_q = qm.apply(
        qparams, input_ids=ids, pixel_patches=patches, vision_layout=la
    )["logits"]
    rel = float(
        jnp.linalg.norm(out_q - out_fp) / (jnp.linalg.norm(out_fp) + 1e-9)
    )
    assert rel < 0.06, rel


def test_quantized_checkpoint_roundtrip(tmp_path):
    """save_quantized/load_quantized preserve int8/int4 trees exactly
    (the pre-quantized serving cold-start path)."""
    from rga3_tpu.ops.quant import (
        is_quantized_dir, load_quantized, save_quantized,
    )

    rng = np.random.default_rng(11)
    w8 = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    w4 = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q8, s8 = quantize_int8(w8)
    q4, sg = quantize_int4(w4)
    tree = {"params": {"qwen": {
        "q_proj": {"kernel_q": np.asarray(q8), "scale": np.asarray(s8)},
        "up_proj": {"kernel_q4": np.asarray(q4),
                    "scale_g": np.asarray(sg)},
        "norm": {"scale": np.ones((32,), np.float32)},
    }}}
    out = tmp_path / "qckpt"
    assert not is_quantized_dir(str(out / "x"))  # robust to missing dirs
    save_quantized(tree, str(out), meta={"bits": 4, "mode": "int4",
                                         "arch": "unigr"})
    assert is_quantized_dir(str(out))
    loaded, meta = load_quantized(str(out))
    assert meta["mode"] == "int4"
    got = loaded["params"]["qwen"]
    assert got["q_proj"]["kernel_q"].dtype == np.int8
    np.testing.assert_array_equal(
        got["q_proj"]["kernel_q"], np.asarray(q8))
    np.testing.assert_array_equal(
        got["up_proj"]["kernel_q4"], np.asarray(q4))
    np.testing.assert_allclose(got["up_proj"]["scale_g"], np.asarray(sg))
    np.testing.assert_allclose(got["q_proj"]["scale"], np.asarray(s8))


def test_int4_pallas_kernel_interpret_matches_fallback():
    """The TPU dequant-matmul kernel (interpret mode) against the XLA
    halves path, across the dispatch regimes: group-32 scales (half %
    256 == 0), per-channel scales, and odd shapes that fall back."""
    from rga3_tpu.ops.quant import _int4_unpack_halves

    rng = np.random.default_rng(3)
    for in_dim, out, m in [(512, 512, 1), (512, 384, 5), (96, 128, 2)]:
        w = jnp.asarray(rng.normal(size=(in_dim, out)) * 0.05, jnp.float32)
        x = jnp.asarray(rng.normal(size=(m, in_dim)), jnp.float32)
        q4, sg = quantize_int4(w)
        wl, wh = _int4_unpack_halves(q4, sg, x.dtype)
        ref = x[..., : in_dim // 2] @ wl + x[..., in_dim // 2:] @ wh
        out_k = int4_matmul(x, q4, sg, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(ref), rtol=5e-2, atol=5e-2
        )


def test_int4_random_quantized_params_matches_whole_tree():
    """random_quantized_params (leaf-wise jits) produces the same tree
    structure/dtypes as quantize_qwen_params over a full fp tree."""
    import jax

    from rga3_tpu.models.qwen25vl import tiny_config
    from rga3_tpu.models.qwen25vl.language import QwenForCausalLM
    from rga3_tpu.ops.quant import random_quantized_params

    cfg = tiny_config().text
    model = QwenForCausalLM(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    shapes = jax.eval_shape(
        lambda k: model.init(k, input_ids=ids), jax.random.PRNGKey(0)
    )
    from flax.core import meta

    got = random_quantized_params(meta.unbox(shapes)["params"], bits=4)
    fp = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        meta.unbox(shapes)["params"],
    )
    want = quantize_qwen_params(fp, bits=4)
    gl = jax.tree_util.tree_flatten_with_path(got)[0]
    wl = jax.tree_util.tree_flatten_with_path(want)[0]
    assert [p for p, _ in gl] == [p for p, _ in wl]
    for (p, g), (_, w) in zip(gl, wl):
        assert g.shape == w.shape, (p, g.shape, w.shape)
        assert g.dtype == w.dtype, (p, g.dtype, w.dtype)
