"""Regenerate the frozen trained-quantizer artifacts (queries/quantizers.py).

VERDICT r11/r12 task #2: a16/a76 were the registry's only rows-only
entries because their quantizers were trained at runtime (float-iterative
k-means -- no static SQL can recompute them).  The fix is the
shipped-artifact pattern every production ANN system uses: train ONCE,
freeze the centroids/codebooks as module literals, and let both engines
fold the identical doubles (Python repr round-trips doubles exactly, in
Spark ``F.lit`` and in a DuckDB SQL literal alike).

Training provenance (deterministic -- canonical-order bounded sample,
fixed seed, fixed iteration count):

    embeddings @ /root/testdata/sf0.01 (500 x 64, the driver's
    correctness SF)
    A16_CENTROIDS = train_ivf_centroids(e, n_clusters=8,
        sample_size=2048, iters=10, seed=42, order_col="vec_id")
    A76_CODEBOOKS = train_pq_codebooks(e, m=16, ksub=16,
        sample_size=2048, iters=10, seed=42, order_col="vec_id")
    A209_CENTROIDS = train_ivf_centroids(e,
        n_clusters=max(4, isqrt(n)) = 22, sample_size=2048, iters=10,
        seed=42, order_col="vec_id")  -- EXACTLY a209's runtime call at
        the driver's correctness SF, so the runtime-trained quantizer
        and these literals are the same doubles (pytest-pinned); the
        DuckDB twin recomputes assignment/pair-search/closure over them
        (round 14, VERDICT r13 task #1)

    A220_CENTROIDS_BY_CORPUS (round 17, VERDICT r16 task #1): the SAME
        a209 training call run at EACH test SF's corpus --
        n_clusters=max(4, isqrt(n)) over the canonical top-2048 sample
        -- keyed by (corpus count, corpus checksum), because a220 runs
        the full production recipe (retrain k ~ sqrt(n) AND recalibrate
        tau together) and the frozen artifact must track the corpus it
        was trained on.  The count alone is AMBIGUOUS (sf0.001 and
        sf0.01 both hold 500 embeddings with different values), so the
        key adds an integer corpus checksum -- SUM(floor(1e6 *
        embedding[1])) as BIGINT -- that both engines compute
        bit-identically (float -> double widening is exact, floor of a
        double is exact, integer sums are order-independent).  The
        sf0.01 entry IS A209_CENTROIDS (identical call, identical
        doubles -- emitted as a reference, not a copy); a220's runtime
        fallback retrains for any corpus outside this registry (e.g.
        the 10x replica).

Run: python tools/freeze_quantizers.py  (rewrites queries/quantizers.py)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
OUT = (
    Path(__file__).resolve().parent.parent
    / "bigdata_scala_offline_data_clean_spark"
    / "queries"
    / "quantizers.py"
)

HEADER = '''"""Frozen trained-quantizer artifacts (generated -- do not hand-edit).

Regenerate with ``python tools/freeze_quantizers.py``; provenance and
rationale live in that script's docstring.  These literals are the
"trained index artifact" a production ANN deployment ships: a16/a76
load them instead of re-training per run, and their DuckDB oracles
embed the SAME doubles, making assignment/distance exactly
recomputable (the a199/a200 pinned-quantizer contract, now at trained
quality instead of raw seed rows).
"""

# fmt: off
'''


def _fmt_floats(xs: list[float], indent: str) -> str:
    parts = [repr(float(x)) for x in xs]
    lines, cur = [], indent
    for p in parts:
        if len(cur) + len(p) + 2 > 79:
            lines.append(cur.rstrip())
            cur = indent
        cur += p + ", "
    lines.append(cur.rstrip())
    return "\n".join(lines)


def main() -> None:
    from bigdata_scala_offline_data_clean_spark.operators.similarity import (
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from bigdata_scala_offline_data_clean_spark.queries._util import load_table
    from bigdata_scala_offline_data_clean_spark.session import build_session

    import math

    spark = build_session()
    e = load_table(spark, SF_DIR, "embeddings")
    cents = train_ivf_centroids(
        e, n_clusters=8, sample_size=2048, iters=10, seed=42,
        order_col="vec_id",
    )
    books = train_pq_codebooks(
        e, m=16, ksub=16, sample_size=2048, iters=10, seed=42,
        order_col="vec_id",
    )
    k209 = max(4, math.isqrt(e.count()))
    cents209 = train_ivf_centroids(
        e, n_clusters=k209, sample_size=2048, iters=10, seed=42,
        order_col="vec_id",
    )
    # a220: the identical training call at every test SF, keyed by the
    # (count, checksum) corpus identity (sf0.01's artifact is A209
    # itself -- same call, same doubles)
    from bigdata_scala_offline_data_clean_spark.operators.similarity import (
        corpus_fingerprint,
    )

    cents220: list[tuple[str, tuple[int, int], list[list[float]] | None]] = []
    for tag, sf in (
        ("SF0001", "/root/testdata/sf0.001"),
        ("SF001", "/root/testdata/sf0.01"),
        ("SF01", "/root/testdata/sf0.1"),
    ):
        esf = load_table(spark, sf, "embeddings")
        key = corpus_fingerprint(esf)
        if tag == "SF001":
            cents220.append((tag, key, None))  # A209 reference
            continue
        cents220.append(
            (
                tag,
                key,
                train_ivf_centroids(
                    esf, n_clusters=max(4, math.isqrt(key[0])),
                    sample_size=2048, iters=10, seed=42,
                    order_col="vec_id",
                ),
            )
        )
    spark.stop()

    out = [HEADER]
    out.append("A16_CENTROIDS = [  # 8 x 64, IVF coarse quantizer\n")
    for c in cents:
        out.append("    [\n" + _fmt_floats(c, "        ") + "\n    ],\n")
    out.append("]\n\n")
    out.append(
        "A76_CODEBOOKS = [  # 16 subspaces x 16 codewords x 4 dims\n"
    )
    for book in books:
        out.append("    [\n")
        for c in book:
            out.append("        [" + ", ".join(repr(float(x)) for x in c) + "],\n")
        out.append("    ],\n")
    out.append("]\n\n")
    out.append(
        f"A209_CENTROIDS = [  # {len(cents209)} x 64, trained "
        "k = isqrt(n) @ sf0.01\n"
    )
    for c in cents209:
        out.append("    [\n" + _fmt_floats(c, "        ") + "\n    ],\n")
    out.append("]\n")
    entries = []
    for tag, key, cents in cents220:
        if cents is None:
            entries.append((key, "A209_CENTROIDS"))
            continue
        name = f"_A220_{tag}_CENTROIDS"
        out.append(
            f"\n{name} = [  # {len(cents)} x 64, "
            f"trained k = max(4, isqrt({key[0]}))\n"
        )
        for c in cents:
            out.append(
                "    [\n" + _fmt_floats(c, "        ") + "\n    ],\n"
            )
        out.append("]\n")
        entries.append((key, name))
    keys = ",\n    ".join(f"{k!r}: {name}" for k, name in entries)
    out.append(
        "\n# (corpus count, corpus checksum) -> trained quantizer (a220's"
        "\n# artifact registry; the sf0.01 artifact is A209 itself --"
        "\n# identical training call).  Key = similarity.corpus_fingerprint."
        f"\nA220_CENTROIDS_BY_CORPUS = {{\n    {keys},\n}}\n"
    )
    OUT.write_text("".join(out))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
