"""Round-10 tests: oracle-checked IVF / PQ ANN cores (VERDICT r9 #2).

The DuckDB oracle already exact-matches both queries end-to-end; these
tests pin the pieces the oracle can't see in isolation:

- full-probe IVF degenerates to the exact brute-force top-k (the same
  equivalence a16 pins for the trained path),
- every IVF candidate really came from one of its query's probed
  buckets,
- the PQ ADC distances equal an independent numpy reimplementation of
  code assignment + asymmetric distance (so the Spark expression tree
  and the SQL twin can't share a common bug).
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.queries import round10
from bigdata_scala_offline_data_clean_spark.queries._util import load_table

SF = "/root/testdata/sf0.001"


def test_a199_candidates_come_from_probed_buckets(spark):
    out = round10.a199_ivf_assign(spark, SF).collect()
    assert len(out) == round10._NQ * round10._K
    # recompute each query's probe set with numpy (independent argmin)
    e = load_table(spark, SF, "embeddings")
    rows = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in e.where(
            (F.col("vec_id") < round10._NQ)
            | F.col("vec_id").between(round10._SEED_LO, round10._SEED_HI)
        ).collect()
    }
    cents = np.stack(
        [rows[i] for i in range(round10._SEED_LO, round10._SEED_HI + 1)]
    )
    for q in range(round10._NQ):
        d = ((cents - rows[q]) ** 2).sum(1)
        probed = set((np.argsort(d, kind="stable")[: round10._PROBES] + 1))
        got = {r["n_bucket"] for r in out if r["q_id"] == q}
        assert got <= probed, (q, got, probed)
    # ranks are 1..K per query, cosine within [-1, 1]
    for q in range(round10._NQ):
        ranks = sorted(r["rank"] for r in out if r["q_id"] == q)
        assert ranks == list(range(1, round10._K + 1))
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in out)


def test_a199_full_probe_equals_exact(spark, monkeypatch):
    from bigdata_scala_offline_data_clean_spark.operators.similarity import (
        cosine_topk,
    )

    monkeypatch.setattr(round10, "_PROBES", round10._N_CENT)
    ivf = {
        (r["q_id"], r["n_id"], r["cosine"], r["rank"])
        for r in round10.a199_ivf_assign(spark, SF).collect()
    }
    e = load_table(spark, SF, "embeddings")
    exact = {
        tuple(r)
        for r in cosine_topk(
            e, e.where(F.col("vec_id") < round10._NQ), k=round10._K
        ).collect()
    }
    assert ivf == exact


def test_a200_adc_matches_numpy(spark):
    out = round10.a200_pq_adc(spark, SF).collect()
    assert len(out) == round10._NQ * round10._K
    e = load_table(spark, SF, "embeddings")
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in e.collect()
    }
    cents = np.stack(
        [vecs[i] for i in range(round10._SEED_LO, round10._SEED_HI + 1)]
    )
    m, dsub = round10._M, round10._DSUB

    def codes(v):
        return [
            int(
                np.argmin(
                    ((cents[:, j * dsub : (j + 1) * dsub]
                      - v[j * dsub : (j + 1) * dsub]) ** 2).sum(1),
                    # numpy argmin ties -> first index == cid ASC tie-break
                )
            )
            for j in range(m)
        ]

    for r in out:
        qv, nv = vecs[r["q_id"]], vecs[r["n_id"]]
        cs = codes(nv)
        adc = sum(
            ((qv[j * dsub : (j + 1) * dsub]
              - cents[cs[j], j * dsub : (j + 1) * dsub]) ** 2).sum()
            for j in range(m)
        )
        assert r["approx_dist"] == pytest.approx(adc, abs=2e-6), r


def test_round10_registered_with_oracles():
    from bigdata_scala_offline_data_clean_spark.queries import all_queries

    qs = all_queries()
    for name in ("a199_ivf_assign", "a200_pq_adc"):
        assert name in qs and qs[name].oracle is not None


# --- round-10 task #4: real media codecs (a201/a202) ----------------------


def test_decode_ppm_header_grammar():
    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        decode_ppm,
    )

    px = bytes(range(12))
    # comments between any header tokens, multi-whitespace separators
    payload = b"P6\n# a comment\n2   # inline\n2\n# before maxval\n255\n" + px
    img = decode_ppm(payload)
    assert (img["width"], img["height"], img["maxval"]) == (2, 2, 255)
    assert img["pixels"] == px
    # raster may legally begin with whitespace-valued bytes: exactly ONE
    # separator byte is consumed after maxval
    payload2 = b"P6 1 1 255\n\n\n\x00"  # pixels = (0x0a, 0x0a, 0x00)
    assert decode_ppm(payload2)["pixels"] == b"\n\n\x00"
    with pytest.raises(ValueError):
        decode_ppm(b"P5 1 1 255\n\x00")  # not P6
    with pytest.raises(ValueError):
        decode_ppm(b"P6 2 2 255\n\x00\x00")  # truncated raster


def test_resize_ppm_convention():
    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        resize_ppm,
    )

    # 4x2 image whose pixel (x, y) has R = 10*y + x, G = B = 0
    px = bytearray()
    for y in range(2):
        for x in range(4):
            px += bytes([10 * y + x, 0, 0])
    img = {"width": 4, "height": 2, "maxval": 255, "pixels": bytes(px)}
    out = resize_ppm(img, (2, 1))
    # src x = x*4//2 -> 0, 2; src y = 0*2//1 -> 0
    assert out["pixels"][0::3] == bytes([0, 2])
    assert (out["width"], out["height"]) == (2, 1)


def test_decode_wav_chunk_walk():
    import struct

    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        decode_wav,
    )

    data = struct.pack("<4h", -1, 32767, -32768, 5)
    # LIST chunk with odd length BEFORE fmt/data: the walker must skip it
    # with word alignment, not assume fixed offsets
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
    dat = b"data" + struct.pack("<I", len(data)) + data
    body = junk + fmt + dat
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    a = decode_wav(payload)
    assert a["n_channels"] == 2 and a["sample_rate"] == 8000
    assert a["n_frames"] == 2  # 4 samples / 2 channels
    assert a["samples"] == [-1, 32767, -32768, 5]
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + payload[4:])


def test_resample_zoh_convention():
    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        resample_pcm16,
    )

    audio = {"n_channels": 1, "sample_rate": 12000, "bits_per_sample": 16,
             "n_frames": 9, "samples": list(range(9))}
    out = resample_pcm16(audio, 4000)
    # out_n = 9*4000//12000 = 3; sample j reads src j*12000//4000 = 3j
    assert out["n_frames"] == 3 and out["samples"] == [0, 3, 6]
    assert out["sample_rate"] == 4000


def test_compressed_formats_still_require_injection():
    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n...")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04...")
    # injection still wins over the stdlib default
    assert decode_image(b"P6 1 1 255\n\x00\x00\x00", decoder=len) == 14


def test_a201_a202_registered_with_oracles():
    from bigdata_scala_offline_data_clean_spark.queries import all_queries

    qs = all_queries()
    for name in ("a201_ppm_decode", "a202_wav_decode"):
        assert name in qs and qs[name].oracle is not None


# --- round-10 task #7: mega-module split (round6 -> 3 family modules) -----


def test_round6_split_preserves_registry():
    """The round-10 split of round6.py into round6_stats/_sim/_wh must be
    invisible to the registry: same names, same order, every spec still
    carrying an oracle where it did before."""
    import re
    import subprocess

    from bigdata_scala_offline_data_clean_spark.queries import all_queries
    from bigdata_scala_offline_data_clean_spark.queries import round6

    # the shim's _ORDER is the registration contract
    assert list(round6.QUERIES) == round6._ORDER
    assert len(round6.QUERIES) == 40
    # all 40 present in the global registry, in shim order
    names = list(all_queries())
    sub = [n for n in names if n in set(round6._ORDER)]
    assert sub == round6._ORDER
    # helpers other modules import from the shim still resolve
    from bigdata_scala_offline_data_clean_spark.queries.round6 import (  # noqa: F401
        _A128_K,
        _A139_BUCKETS,
        _C50_K,
        _psi_report,
        _row_digest,
        A139_SQL,
        a110_char_entropy,
        c49_merge_into,
    )


def test_analytics_split_preserves_registry():
    """analytics.py keeps a01-a32 + the frozen-first-50 registration dict;
    a33-a64 moved to analytics_curation.  Same names, same specs."""
    from bigdata_scala_offline_data_clean_spark.queries import (
        all_queries,
        analytics,
        analytics_curation,
    )

    assert len(analytics.QUERIES) == 64
    # every moved name is re-exported from analytics (import contract)
    for n in ("a33_embedding_clusters", "a36_funnel", "a43_sequence_packing",
              "a56_frame_sample", "a64_perplexity_buckets", "_a51_sql"):
        assert hasattr(analytics, n) and hasattr(analytics_curation, n)
    # the registration dict is the only QUERIES owner (curation has none)
    assert not hasattr(analytics_curation, "QUERIES")
    # spot the order contract: a01 leads the analytics dict, a64 closes it
    names = list(analytics.QUERIES)
    assert names[0] == "a01_pricing_summary" and names[-1] == "a64_perplexity_buckets"
    assert set(names) <= set(all_queries())


def test_suffix_splits_preserve_registries():
    """extensions/round5b/round7 each merged a _b suffix module in round
    10; the merged dicts must keep every name and the suffix order."""
    from bigdata_scala_offline_data_clean_spark.queries import (
        extensions, extensions_b, round5b, round5b_b, round7, round7_b,
    )

    for parent, child in ((extensions, extensions_b),
                          (round5b, round5b_b), (round7, round7_b)):
        names = list(parent.QUERIES)
        child_names = list(child.QUERIES)
        # child names form the SUFFIX of the parent registry, in order
        assert names[-len(child_names):] == child_names
        # and every child callable is re-exported from the parent
        for n in child_names:
            assert hasattr(parent, child.QUERIES[n].spark.__name__)


def test_codec_malformed_payload_guards():
    """Round-10 review fixes: malformed payloads fail loudly with
    ValueError instead of returning silently shifted/truncated data."""
    import struct

    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
    )

    # non-whitespace byte after maxval -> malformed header, not a shifted
    # raster
    with pytest.raises(ValueError, match="separator"):
        decode_ppm(b"P6 1 1 255X" + bytes(3))
    # data chunk declaring more bytes than remain -> truncated, not stats
    # over the remnant
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    bad = b"data" + struct.pack("<I", 1000) + bytes(20)
    payload = b"RIFF" + struct.pack("<I", 4 + len(fmt + bad)) + b"WAVE" + fmt + bad
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload)
    # short fmt chunk -> ValueError, not struct.error
    sfmt = b"fmt " + struct.pack("<I", 4) + bytes(4)
    dat = b"data" + struct.pack("<I", 4) + bytes(4)
    payload2 = b"RIFF" + struct.pack("<I", 4 + len(sfmt + dat)) + b"WAVE" + sfmt + dat
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(payload2)


def test_resample_zoh_stereo_frames():
    """Frame-wise ZOH: a stereo resample keeps BOTH channels of each
    copied frame (round-10 review fix -- sample-as-frame indexing dropped
    every channel but the first)."""
    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        resample_pcm16,
    )

    # 4 stereo frames at 8000 Hz: (L0,R0) (L1,R1) (L2,R2) (L3,R3)
    audio = {"n_channels": 2, "sample_rate": 8000, "bits_per_sample": 16,
             "n_frames": 4, "samples": [10, -10, 11, -11, 12, -12, 13, -13]}
    out = resample_pcm16(audio, 4000)
    # out_n = 2; frame j reads source frame 2j -> frames 0 and 2
    assert out["n_frames"] == 2
    assert out["samples"] == [10, -10, 12, -12]
    assert len(out["samples"]) == out["n_frames"] * out["n_channels"]


def test_percentile_q_range_and_codec_edge_guards(spark):
    """Round-10 second-review fixes: loud contracts on the edges."""
    import struct

    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        decode_wav,
        resample_pcm16,
    )
    from bigdata_scala_offline_data_clean_spark.operators.ordering import (
        exact_percentiles,
        exact_percentiles_frame,
    )

    df = spark.range(10).selectExpr("cast(id as double) as v")
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        exact_percentiles(df, "v", [0.5, 1.5])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        exact_percentiles_frame(df, "v", [-0.1])

    # zero-channel fmt chunk -> ValueError, not ZeroDivisionError
    fmt0 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 0, 8000, 0, 2, 16)
    dat = b"data" + struct.pack("<I", 4) + bytes(4)
    p = b"RIFF" + struct.pack("<I", 4 + len(fmt0 + dat)) + b"WAVE" + fmt0 + dat
    with pytest.raises(ValueError, match="zero channels"):
        decode_wav(p)

    # clipped TRAILING metadata chunk does not reject intact audio
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    dat = b"data" + struct.pack("<I", 4) + struct.pack("<2h", 7, -7)
    junk = b"LIST" + struct.pack("<I", 1000) + b"clipped"
    p2 = b"RIFF" + struct.pack("<I", 4 + len(fmt + dat + junk)) + b"WAVE" + fmt + dat + junk
    assert decode_wav(p2)["samples"] == [7, -7]

    # injected mono decoders may omit n_channels (pre-fix contract)
    out = resample_pcm16(
        {"sample_rate": 8000, "n_frames": 4, "samples": [1, 2, 3, 4]}, 4000
    )
    assert out["samples"] == [1, 3]


# --- a203: winnowing (Schleimer-Wilkerson-Aiken) ---------------------------


def test_winnowing_coverage_guarantee(spark):
    """The SWA guarantee: any shared substring of >= w + k - 1 chars
    between two documents yields at least one SHARED fingerprint."""
    from bigdata_scala_offline_data_clean_spark.operators.text import (
        winnow_fingerprints,
    )

    k, w = 5, 4
    shared = "zqxjvkwpbn"  # len 10 >= w + k - 1 = 8, rare chars
    rows = [
        (1, "aaaa " + shared + " bbbb cccc dddd"),
        (2, "eeee ffff " + shared + " gggg"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(df, k=k, w=w).collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2, "shared substring produced no shared fingerprint"


def test_winnowing_edges(spark):
    from bigdata_scala_offline_data_clean_spark.operators.text import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    # doc shorter than k -> no grams -> no fingerprints (and no crash
    # from Spark's downward-counting sequence(1, 0))
    df = spark.createDataFrame(
        [(1, "ab"), (2, "exactly-long-enough")], ["doc_id", "text"]
    )
    fps = winnow_fingerprints(df, k=5, w=4)
    got = {r["doc_id"] for r in fps.collect()}
    assert got == {2}
    # ubiquity cap: a fingerprint in > df_cap docs is dropped entirely
    many = spark.createDataFrame(
        [(i, "same text everywhere") for i in range(5)], ["doc_id", "text"]
    )
    all_pairs = winnow_match_pairs(
        winnow_fingerprints(many, k=5, w=4), df_cap=10
    ).count()
    capped = winnow_match_pairs(
        winnow_fingerprints(many, k=5, w=4), df_cap=4
    ).count()
    assert all_pairs == 10 and capped == 0  # C(5,2) pairs vs all dropped


def test_injected_compressed_codec_end_to_end():
    """VERDICT r10 task #5: prove the production decoder-injection contract
    with real bytes, not just the error path.  A zlib-wrapped P6 / WAV
    stands in for PNG / FLAC: the injected decoder decompresses and hands
    off to the stdlib parser, and every metadata field must equal the
    uncompressed twin's through all four injection points
    (multimodal.py decode_image / resize_image / decode_audio /
    resample_audio).
    """
    import struct
    import zlib

    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        decode_ppm,
        decode_wav,
        resample_audio,
        resize_image,
    )

    # -- image: 2x2 P6 with distinct pixels --------------------------------
    raster = bytes(range(12))
    ppm = b"P6 2 2 255\n" + raster
    zppm = zlib.compress(ppm)
    png_like = lambda b: decode_ppm(zlib.decompress(b))  # noqa: E731

    # the compressed payload is NOT natively decodable ...
    with pytest.raises(NotImplementedError):
        decode_image(zppm)
    # ... but the injected decoder restores the exact uncompressed result
    assert decode_image(zppm, decoder=png_like) == decode_ppm(ppm)

    # resize through the same injection point: identical to the
    # uncompressed default path
    assert resize_image(zppm, (1, 1), decoder=png_like) == resize_image(
        ppm, (1, 1)
    )

    # -- audio: mono 16-bit PCM, 4 samples at 8 kHz ------------------------
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    dat = b"data" + struct.pack("<I", 8) + struct.pack("<4h", 3, -3, 5, -5)
    wav = b"RIFF" + struct.pack("<I", 4 + len(fmt + dat)) + b"WAVE" + fmt + dat
    zwav = zlib.compress(wav)
    flac_like = lambda b: decode_wav(zlib.decompress(b))  # noqa: E731

    with pytest.raises(NotImplementedError):
        decode_audio(zwav)
    assert decode_audio(zwav, decoder=flac_like) == decode_wav(wav)
    assert resample_audio(zwav, 4000, decoder=flac_like) == resample_audio(
        wav, 4000
    )
