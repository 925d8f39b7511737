"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
the reference has no distributed tests; here dp+tp must compile and run)."""

import numpy as np
import pytest


def test_mesh_construction():
    import jax

    from surya_tpu.parallel import mesh as meshlib

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_tp_param_placement():
    import jax
    from jax.sharding import PartitionSpec as P

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder
    from surya_tpu.parallel import mesh as meshlib

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    enc = qwen_encoder.EncoderConfig(depth=1, hidden_size=64, intermediate_size=128, num_heads=4, window_size=56, out_hidden_size=64, fullatt_block_indexes=())
    dec = qwen_decoder.DecoderConfig(vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2)
    cfg = foundation.FoundationConfig(vocab_size=128, encoder=enc, decoder=dec)
    params = foundation.init_params(cfg, jax.random.PRNGKey(0))
    sharded = meshlib.shard_foundation_params(params, mesh)

    q_kernel = sharded["decoder"]["layers"][0]["self_attn"]["q_proj"]["kernel"]
    o_kernel = sharded["decoder"]["layers"][0]["self_attn"]["o_proj"]["kernel"]
    emb = sharded["token_embed"]["embedding"]
    assert q_kernel.sharding.spec == P(None, meshlib.MODEL_AXIS)
    assert o_kernel.sharding.spec == P(meshlib.MODEL_AXIS, None)
    assert emb.sharding.spec == P()


def test_meshed_recognition_predictor(test_image=None):
    """End-to-end RecognitionPredictor with slots sharded over an 8-device
    data mesh (USE_MESH)."""
    import jax
    from PIL import Image, ImageDraw

    from surya_tpu.settings import settings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    img = Image.new("RGB", (512, 256), "white")
    ImageDraw.Draw(img).text((10, 10), "mesh test line", fill="black", font_size=24)

    old = settings.USE_MESH
    settings.USE_MESH = True
    try:
        from surya_tpu.recognition import RecognitionPredictor

        pred = RecognitionPredictor(tiny=True)
        pred.batch_size = 15
        pred.n_slots = 15  # +1 trash slot = 16, divisible by 8
        pred.prefill_rows = 8
        pred.patch_caps = (1024, 4096)
        results = pred([img], bboxes=[[[5, 5, 200, 40], [5, 60, 300, 100]]])
        assert len(results) == 1
        assert len(results[0].text_lines) == 2
        assert pred.mesh is not None
    finally:
        settings.USE_MESH = old


def test_meshed_predictor_unaligned_batch():
    """A caller batch size whose slots+trash is NOT divisible by the data
    axis must still run: prediction_loop realigns the slot count (regression
    for the device_put divisibility crash with default batch sizes)."""
    import jax
    from PIL import Image, ImageDraw

    from surya_tpu.settings import settings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    img = Image.new("RGB", (512, 256), "white")
    ImageDraw.Draw(img).text((10, 10), "unaligned batch", fill="black", font_size=24)

    old = settings.USE_MESH
    settings.USE_MESH = True
    try:
        from surya_tpu.recognition import RecognitionPredictor

        pred = RecognitionPredictor(tiny=True)
        pred.prefill_rows = 8
        pred.patch_caps = (1024, 4096)
        # 8 slots + trash = 9: not divisible by 8 without realignment
        results = pred([img], bboxes=[[[5, 5, 200, 40]]], recognition_batch_size=8)
        assert len(results) == 1 and len(results[0].text_lines) == 1
    finally:
        settings.USE_MESH = old


def test_meshed_tp_recognition_predictor():
    """End-to-end RecognitionPredictor with tensor parallelism
    (MESH_NUM_MODEL_SHARDS=2, 4x2 mesh): output must match the
    single-device run on the same tiny seeded model."""
    import jax
    from PIL import Image, ImageDraw

    from surya_tpu.settings import settings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    img = Image.new("RGB", (512, 256), "white")
    ImageDraw.Draw(img).text((10, 10), "tp mesh test line", fill="black", font_size=24)
    bboxes = [[[5, 5, 200, 40], [5, 60, 300, 100]]]

    from surya_tpu.recognition import RecognitionPredictor

    single = RecognitionPredictor(tiny=True)
    single.batch_size = 15
    base = single([img], bboxes=bboxes)

    old_mesh, old_tp = settings.USE_MESH, settings.MESH_NUM_MODEL_SHARDS
    settings.USE_MESH = True
    settings.MESH_NUM_MODEL_SHARDS = 2
    try:
        pred = RecognitionPredictor(tiny=True)
        pred.batch_size = 15
        pred.n_slots = 15  # +1 trash slot = 16, divisible by data axis (4)
        pred.prefill_rows = 8
        pred.patch_caps = (1024, 4096)
        results = pred([img], bboxes=bboxes)
        assert pred.mesh is not None
        assert dict(pred.mesh.shape) == {"data": 4, "model": 2}
    finally:
        settings.USE_MESH = old_mesh
        settings.MESH_NUM_MODEL_SHARDS = old_tp

    assert len(results) == 1 and len(results[0].text_lines) == 2
    for tl_tp, tl_single in zip(results[0].text_lines, base[0].text_lines):
        assert tl_tp.text == tl_single.text
        assert abs(tl_tp.confidence - tl_single.confidence) < 1e-3


def test_meshed_batch_predictors():
    """Detection/layout/table-rec/OCR-error shard their batch axis over the
    dp mesh; results must match the single-device run."""
    import jax
    from PIL import Image, ImageDraw

    from surya_tpu.settings import settings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    img = Image.new("RGB", (512, 512), "white")
    d = ImageDraw.Draw(img)
    d.text((20, 30), "mesh layout line", fill="black", font_size=24)
    d.rectangle((50, 200, 450, 400), outline="black", width=2)
    texts = ["This is a sensible sentence.", "a]]3 ;;garbled@@ t3xt//"]

    from surya_tpu.layout import LayoutPredictor
    from surya_tpu.ocr_error import OCRErrorPredictor
    from surya_tpu.table_rec import TableRecPredictor, install_synthetic_tables

    table_img = img.crop((40, 180, 470, 420))

    def make_table_rec():
        # pin the category stream (random-weight argmax is a float knife
        # edge); bboxes stay model-computed, so the meshed-vs-single compare
        # still exercises the full Swin encode + ADETR decode under dp
        tr = TableRecPredictor(tiny=True)
        install_synthetic_tables(tr, n_rows=3, n_cols=2, n_cells=1)
        return tr

    old_boxes = settings.TABLE_REC_MAX_BOXES
    settings.TABLE_REC_MAX_BOXES = 8  # keep the virtual-mesh AR loop fast
    lay_single = LayoutPredictor(tiny=True)
    base_lay = lay_single([img])
    err_single = OCRErrorPredictor(tiny=True)
    base_err = err_single(texts)
    base_tab = make_table_rec()([table_img])

    from surya_tpu.detection import DetectionPredictor

    det_single = DetectionPredictor(tiny=True)
    base_det = det_single([img])

    old = settings.USE_MESH
    settings.USE_MESH = True
    try:
        lay = LayoutPredictor(tiny=True)
        assert lay.mesh is not None
        mesh_lay = lay([img])
        err = OCRErrorPredictor(tiny=True)
        mesh_err = err(texts)
        det = DetectionPredictor(tiny=True)
        assert det.mesh is not None
        mesh_det = det([img])
        tab = make_table_rec()
        assert tab.mesh is not None
        mesh_tab = tab([table_img])
    finally:
        settings.USE_MESH = old
        settings.TABLE_REC_MAX_BOXES = old_boxes

    assert len(mesh_lay) == 1
    assert [b.label for b in mesh_lay[0].bboxes] == [b.label for b in base_lay[0].bboxes]
    assert mesh_err.labels == base_err.labels
    assert [b.bbox for b in mesh_det[0].bboxes] == [b.bbox for b in base_det[0].bboxes]
    assert len(mesh_tab) == 1
    assert len(mesh_tab[0].rows) == len(base_tab[0].rows) == 3
    assert len(mesh_tab[0].cols) == len(base_tab[0].cols) == 2
    assert len(mesh_tab[0].cells) == len(base_tab[0].cells)
    for mc, bc in zip(mesh_tab[0].rows, base_tab[0].rows):
        assert np.abs(np.asarray(mc.polygon) - np.asarray(bc.polygon)).max() < 1.0


def test_dryrun_multichip_step():
    """The driver's dry run: full prefill + decode chunk over a dp+tp mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.parametrize("quantized", [False, True])
def test_gqa_decode_shard_map_parity(quantized):
    """The shard_map-wrapped decode kernel (interpret mode) on a dp+tp mesh
    matches the jnp reference — slots shard over data, KV heads over model
    (VERDICT r2 #3: mesh must keep kernel-grade decode)."""
    import functools

    import jax
    import jax.numpy as jnp

    from surya_tpu.ops import decode_attn
    from surya_tpu.parallel import mesh as meshlib

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = meshlib.make_mesh(n_data=4, n_model=2)

    rng = np.random.default_rng(0)
    layers, B, H, kvh, S, K, D = 2, 8, 8, 4, 256, 8, 64
    q = jnp.asarray(rng.standard_normal((B, H, D), dtype=np.float32) * 0.3)
    ck = jnp.asarray(rng.standard_normal((layers, B, kvh, K, D), dtype=np.float32) * 0.3)
    cv = jnp.asarray(rng.standard_normal((layers, B, kvh, K, D), dtype=np.float32) * 0.3)
    lengths = jnp.asarray(rng.integers(1, S, B), jnp.int32)
    step = jnp.asarray(3, jnp.int32)
    layer = jnp.asarray(1, jnp.int32)

    if quantized:
        kc = jnp.asarray(rng.integers(-127, 127, (layers, B, kvh, S, D)), jnp.int8)
        vc = jnp.asarray(rng.integers(-127, 127, (layers, B, kvh, S, D)), jnp.int8)
        ks = jnp.asarray(rng.random((layers, B, kvh, S), dtype=np.float32) * 0.01 + 1e-3, jnp.bfloat16)
        vs = jnp.asarray(rng.random((layers, B, kvh, S), dtype=np.float32) * 0.01 + 1e-3, jnp.bfloat16)
    else:
        kc = jnp.asarray(rng.standard_normal((layers, B, kvh, S, D), dtype=np.float32) * 0.3)
        vc = jnp.asarray(rng.standard_normal((layers, B, kvh, S, D), dtype=np.float32) * 0.3)
        ks = vs = None

    fn = functools.partial(
        decode_attn.gqa_decode_shard_map, mesh=mesh, interpret=True
    )
    out = np.asarray(jax.jit(fn)(q, kc, vc, lengths, ck, cv, step, layer, ks, vs))
    expected = np.asarray(
        decode_attn.gqa_decode_reference(q, kc, vc, lengths, ck, cv, step, layer, ks, vs)
    )
    assert np.abs(out - expected).max() < 2e-2 if quantized else np.abs(out - expected).max() < 1e-4


def test_prefill_kernels_shard_map_parity():
    """Causal decoder-prefill flash and the encoder's segmented kernel run
    shard_map-wrapped (interpret) on the dp+tp mesh and match the jnp path."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.ops import attention as att
    from surya_tpu.ops import flash
    from surya_tpu.parallel import mesh as meshlib

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(1)

    # causal: [B, L, H, D], B over data, H over model
    B, L, H, kvh, D = 4, 128, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((B, L, H, D), dtype=np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((B, L, kvh, D), dtype=np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, L, kvh, D), dtype=np.float32) * 0.3)
    out = np.asarray(
        jax.jit(lambda a, b, c: flash.causal_flash_attention_shard_map(a, b, c, mesh, interpret=True))(q, k, v)
    )
    causal = att.mask_to_bias(jnp.tril(jnp.ones((L, L), bool)))[None, None]
    expected = np.asarray(att.sdpa(q, k, v, bias=causal))
    assert np.abs(out - expected).max() < 1e-4

    # segmented: replicated packed sequence
    S, He, De = 512, 4, 64
    seg = np.full(S, -1, np.int32)
    seg[:200], seg[200:448] = 0, 1
    qs = jnp.asarray(rng.standard_normal((S, He, De), dtype=np.float32) * 0.3)
    ks2 = jnp.asarray(rng.standard_normal((S, He, De), dtype=np.float32) * 0.3)
    vs2 = jnp.asarray(rng.standard_normal((S, He, De), dtype=np.float32) * 0.3)
    starts = jnp.zeros(S // 128, jnp.int32)
    out2 = np.asarray(
        jax.jit(
            lambda a, b, c, sg, st: flash.segmented_block_attention_shard_map(
                a, b, c, sg, st, S, mesh, interpret=True
            )
        )(qs, ks2, vs2, jnp.asarray(seg), starts)
    )
    logits = np.einsum("qhd,khd->hqk", np.asarray(qs), np.asarray(ks2)) * (De**-0.5)
    mask = seg[:, None] == seg[None, :]
    logits = np.where(mask[None], logits, -1e30)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    expected2 = np.einsum("hqk,khd->qhd", p, np.asarray(vs2))
    assert np.abs(out2 - expected2).max() < 1e-4


def _tiny_foundation():
    import jax

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    enc = qwen_encoder.EncoderConfig(
        depth=2, hidden_size=64, intermediate_size=128, num_heads=4,
        window_size=56, out_hidden_size=64, fullatt_block_indexes=(1,),
    )
    dec = qwen_decoder.DecoderConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    cfg = foundation.FoundationConfig(vocab_size=512, encoder=enc, decoder=dec)
    params = foundation.init_params(cfg, jax.random.PRNGKey(0))
    return params, cfg


def test_sharded_encoder_prefill_parity():
    """The data-sharded encoder path (stacked per-shard packed layouts +
    shard_map encode/gather) produces the same prefill outputs as the flat
    single-device path for the same prompts."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder
    from surya_tpu.parallel import mesh as meshlib

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    n_data = 4

    params, cfg = _tiny_foundation()
    enc = cfg.encoder
    rng = np.random.default_rng(0)

    B = 8  # rows; 2 per data shard
    grids = [(4, 6), (6, 8), (4, 4), (4, 6), (8, 6), (4, 4), (6, 6), (4, 8)]
    raw = {i: rng.standard_normal((h * w, enc.patch_dim), dtype=np.float32) * 0.3 for i, (h, w) in enumerate(grids)}
    n_tok = [h * w // 4 for h, w in grids]
    L = 32
    IMG, BOS, EOI, PAD = cfg.image_token_id, cfg.bos_token_id, 10, cfg.pad_token_id

    def build_rows(order, llm_local=False, rows_s=None):
        ids = np.full((B, L), PAD, np.int32)
        gather = np.full((B, L), -1, np.int32)
        lens = np.zeros(B, np.int32)
        base = 0
        for pos, i in enumerate(order):
            if llm_local and pos % rows_s == 0:
                base = 0
            row = [IMG] * n_tok[i] + [4, 5, 6, 7] + [BOS, 20 + i, EOI]
            ids[pos, : len(row)] = row
            gather[pos, : n_tok[i]] = np.arange(base, base + n_tok[i])
            base += n_tok[i]
            lens[pos] = len(row)
        return ids, gather, lens

    # flat reference path (single device semantics)
    flat_cap = 512
    layout = qwen_encoder.plan_layout(grids, enc, flat_cap)
    flat_patches = np.zeros((flat_cap, enc.patch_dim), np.float32)
    cat = np.concatenate([raw[i] for i in range(B)])
    flat_patches[: cat.shape[0]] = cat
    ids, gather, lens = build_rows(range(B))
    cache = qwen_decoder.init_cache(cfg.decoder, B, 64, jnp.float32)
    slot_idx = jnp.arange(B, dtype=jnp.int32)
    _, tok_f, score_f, bbox_f = foundation.prefill(
        params, cfg, cache, jnp.asarray(flat_patches),
        tuple(jnp.asarray(a) for a in layout.device_args),
        jnp.asarray(layout.llm_h_idx), jnp.asarray(layout.llm_w_idx),
        jnp.asarray(ids), jnp.asarray(gather), jnp.asarray(lens), slot_idx,
        kv_range=layout.kv_range, win_range=layout.win_range, use_pallas=False,
    )

    # sharded path: 2 prompts per shard, group-contiguous rows, local gathers
    rows_s = B // n_data
    groups = [list(range(g * rows_s, (g + 1) * rows_s)) for g in range(n_data)]
    cap_s = 256
    slayout = qwen_encoder.plan_layout_sharded(
        [[grids[i] for i in idxs] for idxs in groups], enc, cap_s
    )
    spatches = np.zeros((n_data, cap_s, enc.patch_dim), np.float32)
    for g, idxs in enumerate(groups):
        catg = np.concatenate([raw[i] for i in idxs])
        spatches[g, : catg.shape[0]] = catg
    ids_s, gather_s, lens_s = build_rows(
        [i for idxs in groups for i in idxs], llm_local=True, rows_s=rows_s
    )
    cache2 = qwen_decoder.init_cache(cfg.decoder, B, 64, jnp.float32)
    with mesh:
        _, tok_s, score_s, bbox_s = jax.jit(
            lambda c, p, ea, h, w, i2, g2, l2, s2: foundation.prefill(
                params, cfg, c, p, ea, h, w, i2, g2, l2, s2,
                kv_range=slayout.kv_range, win_range=slayout.win_range,
                use_pallas=False, mesh=mesh,
            )
        )(
            cache2, jnp.asarray(spatches),
            tuple(jnp.asarray(a) for a in slayout.device_args),
            jnp.asarray(slayout.llm_h_idx), jnp.asarray(slayout.llm_w_idx),
            jnp.asarray(ids_s), jnp.asarray(gather_s), jnp.asarray(lens_s), slot_idx,
        )

    assert np.array_equal(np.asarray(tok_s), np.asarray(tok_f))
    assert np.abs(np.asarray(score_s) - np.asarray(score_f)).max() < 1e-4
    assert np.abs(np.asarray(bbox_s) - np.asarray(bbox_f)).max() <= 1


def test_build_prefill_batch_sharded():
    """n_shards>1: group-contiguous rows, shard-local gathers, valid_rows
    round-trips every prompt, and content matches the flat build."""
    from surya_tpu.recognition.loader import load_recognition_model

    _, cfg, proc = load_recognition_model(None, tiny=True)
    rng = np.random.default_rng(1)
    imgs = [rng.random((h, w, 3)).astype(np.float32) * 255 for h, w in [(56, 224), (56, 112), (28, 112), (56, 168)]]
    tasks = ["ocr_with_boxes"] * 4
    flat = proc.build_prefill_batch(
        imgs, tasks, [None] * 4, [True] * 4, cfg.encoder,
        batch_rows=8, seq_buckets=(128,), patch_caps=(1024, 4096), n_shards=1,
    )
    sh = proc.build_prefill_batch(
        imgs, tasks, [None] * 4, [True] * 4, cfg.encoder,
        batch_rows=8, seq_buckets=(128,), patch_caps=(1024, 4096), n_shards=2,
    )
    assert sh.patches.ndim == 3 and sh.patches.shape[0] == 2
    assert sh.valid_rows.shape == (4,)
    assert len(set(sh.valid_rows.tolist())) == 4
    rows_s = 8 // 2
    for i, r in enumerate(sh.valid_rows):
        g = r // rows_s
        # same token row content as the flat build, just relocated
        assert np.array_equal(sh.input_ids[r], flat.input_ids[i])
        assert sh.seq_lens[r] == flat.seq_lens[i]
        # gathers are shard-local: indices fit the shard's llm capacity
        valid = sh.img_gather[r][sh.img_gather[r] >= 0]
        assert valid.max() < sh.layout.unscatter.shape[1], (g, valid.max())
    # padding rows stay padding
    used = set(sh.valid_rows.tolist())
    for r in range(8):
        if r not in used:
            assert (sh.input_ids[r] == proc.pad_token_id).all()
    # tokens_per_image keeps its per-INPUT-image contract despite the LPT
    # group permutation (sharded plan restores input order via orig_index)
    assert sh.layout.tokens_per_image == flat.layout.tokens_per_image


def test_kernel_shardable_odd_mesh_falls_back():
    """Mesh shapes shard_map can't divide (model axis not dividing kv heads,
    data axis not dividing slots) route to the jnp path instead of crashing
    at trace time inside the jitted program."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.ops import decode_attn
    from surya_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(n_data=2, n_model=4)  # 4 does not divide kvh=2
    assert not meshlib.kernel_shardable(mesh, 8, 4, 2)
    assert meshlib.kernel_shardable(mesh, 8, 8, 4)
    assert not meshlib.kernel_shardable(mesh, 7, 8, 4)  # data doesn't divide

    layers, B, H, kvh, S, K, D = 1, 8, 4, 2, 16, 4, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((layers, B, kvh, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((layers, B, kvh, S, D)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((layers, B, kvh, K, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((layers, B, kvh, K, D)), jnp.float32)
    lens = jnp.full((B,), 8, jnp.int32)

    # use_pallas=True + incompatible mesh: dispatcher must not reach the
    # shard_map wrapper (whose specs would raise) — jnp reference instead
    with mesh:
        out = jax.jit(
            lambda *a: decode_attn.gqa_decode(*a, use_pallas=True, mesh=mesh)
        )(q, kc, vc, lens, ck, cv, jnp.int32(2), jnp.int32(0))
    ref = decode_attn.gqa_decode_reference(
        q, kc, vc, lens, ck, cv, jnp.int32(2), jnp.int32(0)
    )
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5
