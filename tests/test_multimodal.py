"""Multimodal tests: REAL codec round-trips (BMP stride/orientation/BGR,
RIFF chunk walk, VID0 frame walk) plus the Spark plumbing — schema,
Arrow batch shape, partition independence, frame fan-out."""

import pytest

from de_final_project_spark.operators.multimodal import (
    AUDIO_RATE,
    _geom,
    _pixel,
    decode_bmp,
    decode_vid,
    decode_wav,
    encode_bmp,
    encode_vid,
    encode_wav,
    extract_features,
    frame_sample,
    multimodal_features,
    resize_media,
    synthesize_media,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- codecs

def test_bmp_roundtrip_and_padding():
    # width 5 -> stride 16 (padding exercised); known pixel sums
    px = [[(x, 2 * x, y) for x in range(5)] for y in range(3)]
    payload = encode_bmp(5, 3, px)
    assert payload[:2] == b"BM"
    assert len(payload) == 54 + 3 * 16
    w, h, sr, sg, sb = decode_bmp(payload)
    assert (w, h) == (5, 3)
    assert sr == sum(x for y in range(3) for x in range(5))
    assert sg == sum(2 * x for y in range(3) for x in range(5))
    assert sb == sum(y for y in range(3) for x in range(5))


def test_bmp_channel_order_not_swapped():
    # a single red pixel: BGR storage means byte 54 is BLUE=0, byte 56 RED
    payload = encode_bmp(1, 1, [[(200, 10, 3)]])
    assert payload[54:57] == bytes((3, 10, 200))
    assert decode_bmp(payload)[2:] == (200, 10, 3)


def test_wav_roundtrip():
    payload = encode_wav(1234)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * 1234
    assert decode_wav(payload) == 1234 / float(AUDIO_RATE)


def test_vid_roundtrip():
    frames = [
        encode_bmp(2, 2, [[(f, f, f)] * 2] * 2) for f in range(3)
    ]
    payload = encode_vid(frames)
    assert decode_vid(payload) == frames


def test_decoders_reject_garbage():
    for fn in (decode_bmp, decode_wav, decode_vid):
        with pytest.raises(ValueError):
            fn(b"\x00" * 64)


# ------------------------------------------------------------- plumbing

def test_media_schema(spark):
    media = synthesize_media(spark, SF_DIR)
    assert dict(media.dtypes) == {
        "doc_id": "bigint", "media_type": "string", "payload": "binary"
    }
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_features_deterministic_and_partition_independent(spark):
    media = synthesize_media(spark, SF_DIR)
    a = sorted(tuple(r) for r in extract_features(media).collect())
    b = sorted(tuple(r) for r in extract_features(media.repartition(11)).collect())
    assert a == b
    assert len(a) == media.count()


def test_features_match_generator_formulas(spark):
    """The decoded stats must equal the closed-form generator values —
    the property the DuckDB oracle relies on."""
    out = multimodal_features(spark, SF_DIR).collect()
    assert len(out) == 500
    for r in out:
        w, h, nf, ns = _geom(r.doc_id)
        if r.media_type == "audio":
            assert r.n_bytes == 44 + 2 * ns
            assert r.duration_s == ns / float(AUDIO_RATE)
            assert r.width is None and r.sum_r is None
            continue
        stride = (3 * w + 3) // 4 * 4
        bmp_bytes = 54 + h * stride
        frames = range(1) if r.media_type == "image" else range(nf)
        exp = [0, 0, 0]
        for f in frames:
            for y in range(h):
                for x in range(w):
                    p = _pixel(r.doc_id, f, x, y)
                    for i in range(3):
                        exp[i] += p[i]
        assert (r.width, r.height) == (w, h)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(exp)
        if r.media_type == "image":
            assert r.n_frames == 1 and r.n_bytes == bmp_bytes
        else:
            assert r.n_frames == nf and r.n_bytes == 8 + nf * bmp_bytes
            assert r.duration_s == nf / 4.0


def test_frame_sample_real_frames(spark):
    media = synthesize_media(spark, SF_DIR)
    videos = {r.doc_id for r in media.where("media_type = 'video'").collect()}
    frames = frame_sample(media, n_frames=4).collect()
    assert {r.doc_id for r in frames} == videos
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        w, h, nf, _ = _geom(doc_id)
        assert len(rows) == min(4, nf)  # videos have 2-4 frames
        assert sorted(r.frame_idx for r in rows) == [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)]
        assert all((r.width, r.height) == (w, h) for r in rows)
        assert all(0.0 <= r.brightness <= 1.0 for r in rows)


def test_resize_media_real(spark):
    media = synthesize_media(spark, SF_DIR)
    out = resize_media(media, 8, 6)
    rows = out.collect()
    n_images = media.where("media_type = 'image'").count()
    assert len(rows) == n_images
    for r in rows:
        w, h, sr, sg, sb = decode_bmp(bytes(r.payload))
        assert (w, h) == (8, 6) == (r.width, r.height)
        # nearest-neighbor: expected sums from the source pixel formula
        sw, sh, _, _ = _geom(r.doc_id)
        exp = [0, 0, 0]
        for ty in range(6):
            for tx in range(8):
                p = _pixel(r.doc_id, 0, (tx * sw) // 8, (ty * sh) // 6)
                for i in range(3):
                    exp[i] += p[i]
        assert (sr, sg, sb) == tuple(exp)


def test_binaryfile_roundtrip_matches_inmemory(spark, tmp_path):
    """write media files -> binaryFile scan -> decode == in-memory decode."""
    from de_final_project_spark.operators.multimodal import (
        extract_features,
        media_from_binary_files,
        synthesize_media,
        write_media_files,
    )
    from de_final_project_spark.sources.readers import read_binary_files

    media = synthesize_media(spark, "/root/testdata/sf0.001").limit(30)
    out_dir = str(tmp_path / "media")
    n = write_media_files(media, out_dir)
    assert n == 30

    files = read_binary_files(spark, out_dir)
    ingested = media_from_binary_files(files)
    got = {
        r["doc_id"]: r
        for r in extract_features(ingested).collect()
    }
    want = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]


def test_binaryfile_glob_prunes_listing(spark, tmp_path):
    from de_final_project_spark.operators.multimodal import (
        synthesize_media,
        write_media_files,
    )
    from de_final_project_spark.sources.readers import read_binary_files

    media = synthesize_media(spark, "/root/testdata/sf0.001").limit(12)
    out_dir = str(tmp_path / "media")
    write_media_files(media, out_dir)
    bmps = read_binary_files(spark, out_dir, glob="*.bmp")
    assert bmps.count() == media.where("media_type = 'image'").count()
    # metadata-only projection must not read binary bodies
    plan = bmps.select("path", "length")._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_pool_bmp_features_closed_form():
    """The byte-walk pooling must equal the closed-form pixel function
    the oracle restates — per cell, per channel, exact integer sums."""
    from de_final_project_spark.operators.multimodal import (
        POOL_GRID,
        _geom,
        _make_payload,
        _pixel,
        pool_bmp_features,
    )

    for doc_id in (0, 3, 9, 33, 96):  # image docs: multiples of 3
        w, h, _, _ = _geom(doc_id)
        want = [0] * 64
        for y in range(h):
            cy = (y * POOL_GRID) // h
            for x in range(w):
                cell = cy * POOL_GRID + (x * POOL_GRID) // w
                r, g, b = _pixel(doc_id, 0, x, y)
                want[cell * 3 + 0] += r
                want[cell * 3 + 1] += g
                want[cell * 3 + 2] += b
        got = pool_bmp_features(_make_payload(doc_id, "image"))
        assert got == want, doc_id


def test_media_knn_shape(spark):
    """Every query returns exactly TOP_K ranked neighbors, none of them
    the query itself, all from the image corpus."""
    from de_final_project_spark.operators.multimodal import media_knn
    from de_final_project_spark.operators.similarity import N_QUERIES, TOP_K

    rows = media_knn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    assert set(by_q) == set(range(N_QUERIES))
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, TOP_K + 1))


def test_wav_envelope_pooling_matches_closed_form():
    """pool_wav_features must equal the closed-form per-bucket abs-sum
    of the generator wave — the property the multimodal ANN oracle
    restates in SQL."""
    from de_final_project_spark.operators.multimodal import (
        AUDIO_BUCKETS,
        AUDIO_POOL_BASE,
        POOL_DIM,
        pool_wav_features,
    )

    doc_id = 7
    _, _, _, ns = _geom(doc_id)
    got = pool_wav_features(encode_wav(ns, seed=doc_id))
    want = [0] * POOL_DIM
    for i in range(ns):
        want[AUDIO_POOL_BASE + (i * AUDIO_BUCKETS) // ns] += abs(
            ((31 * doc_id + 7 * i) % 4096) - 2048
        )
    assert got == want
    assert all(v == 0 for v in got[:AUDIO_POOL_BASE])


def test_vid_pooling_matches_closed_form():
    from de_final_project_spark.operators.multimodal import (
        POOL_DIM,
        VID_POOL_FRAMES,
        VID_POOL_GRID,
        _make_payload,
        pool_vid_features,
    )

    doc_id = 11  # doc_id % 3 == 2 -> video
    w, h, nf, _ = _geom(doc_id)
    got = pool_vid_features(_make_payload(doc_id, "video"))
    want = [0] * POOL_DIM
    for f in range(min(nf, VID_POOL_FRAMES)):
        for y in range(h):
            for x in range(w):
                r, g, b = _pixel(doc_id, f, x, y)
                cell = ((y * VID_POOL_GRID) // h) * VID_POOL_GRID + (
                    (x * VID_POOL_GRID) // w
                )
                d = f * (VID_POOL_GRID * VID_POOL_GRID * 3) + cell * 3
                want[d] += r
                want[d + 1] += g
                want[d + 2] += b
    assert got == want


def test_multimodal_knn_gates_by_modality(spark):
    """Every result row's neighbor shares the query's modality — the
    join-key gate, not a post-filter, so this pins the semantics."""
    from de_final_project_spark.operators.multimodal import (
        media_knn_multimodal,
    )

    out = media_knn_multimodal(spark, SF_DIR).collect()
    assert len(out) > 0
    mt = {0: "image", 1: "audio", 2: "video"}
    for r in out:
        assert r.modality == mt[r.query_id % 3]
        assert r.neighbor_id % 3 == r.query_id % 3
        assert 1 <= r.rank <= 5


def test_media_neardup_block_containment_and_threshold(spark):
    """Round-11 media near-dup: every emitted pair (a) sits inside one
    (trained cell, modality) block — the SemDeDup blocking contract —
    and (b) clears the rounded-cosine threshold; image/video both
    surface pairs at this corpus (audio legitimately has none at this
    size), and no pair crosses modalities."""
    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.operators.multimodal import (
        MEDIA_NEARDUP_THRESHOLD,
        all_media_feature_vectors,
        media_neardup,
        synthesize_media,
    )

    sf = "/root/testdata/sf0.001"
    rows = media_neardup(spark, sf).collect()
    assert rows, "no near-dup pairs at all"
    mods = {r["modality"] for r in rows}
    assert "image" in mods and "video" in mods
    assert all(r["cosine_sim"] >= MEDIA_NEARDUP_THRESHOLD for r in rows)
    assert all(r["a_id"] < r["b_id"] for r in rows)
    feats = all_media_feature_vectors(synthesize_media(spark, sf))
    qdf = feats.select("vec_id", "q")
    cells = {
        r["vec_id"]: r["cell"]
        for r in km.assign_cells(qdf, km.train_kmeans_frame(qdf)).collect()
    }
    mod_of = {r["vec_id"]: r["media_type"] for r in feats.collect()}
    for r in rows:
        assert cells[r["a_id"]] == cells[r["b_id"]], r
        assert mod_of[r["a_id"]] == mod_of[r["b_id"]] == r["modality"], r
