"""Property-based tests (hypothesis) for the pure-Python engine pieces.

These cover the logic the differential oracle can't: the type lattice's
fold rules across the whole input space, upsert SQL quoting, and the
MinHash estimator's statistical contract on adversarial inputs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from cpt_database_sync_spark.functions.typelattice import _JDBC, jdbc_read_type
from cpt_database_sync_spark.sources.sync import upsert_statement


class TestTypeLatticeProperties:
    @given(
        precision=st.integers(min_value=1, max_value=100),
        scale=st.integers(min_value=-20, max_value=50),
    )
    def test_decimal_fold_always_valid(self, precision, scale):
        """Whatever (p, s) JDBC reports, the folded Spark type must be a
        legal DecimalType: 1 <= p <= 38, 0 <= s <= p."""
        m = jdbc_read_type(_JDBC["DECIMAL"], precision, scale)
        dt = m.spark_type
        assert isinstance(dt, T.DecimalType)
        assert 1 <= dt.precision <= 38
        assert 0 <= dt.scale <= dt.precision

    @given(jdbc_type=st.integers(min_value=-200, max_value=3000))
    def test_total_over_type_space(self, jdbc_type):
        """Every possible JDBC type code either maps or returns None under
        the drop policy — never raises (the reference's silent-drop
        contract, sync/M2H2SchemaConverter.java:134-138)."""
        m = jdbc_read_type(jdbc_type, 10, 2)
        assert m is None or isinstance(m.spark_type, T.DataType)


class TestUpsertProperties:
    @given(
        table=st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=20,
        ),
        cols=st.lists(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                min_size=1,
                max_size=10,
            ),
            min_size=1,
            max_size=8,
            unique=True,
        ),
    )
    @settings(max_examples=50)
    def test_bind_count_matches_columns(self, table, cols):
        sql = upsert_statement(table, cols)
        assert sql.count("?") == len(cols)
        assert sql.count("VALUES(") == len(cols)
        for c in cols:
            assert f"`{c}`" in sql


class TestIdentifierProperties:
    """Quoting/escaping round-trips (`utils/Utils.java:94-115`,
    `sync/M2H2SchemaConverter.java:56-60`)."""

    @given(name=st.text(min_size=1, max_size=30), quote=st.sampled_from(['"', "`"]))
    @settings(max_examples=100)
    def test_quote_round_trips(self, name, quote):
        from cpt_database_sync_spark.sources.identifiers import quote_identifier

        q = quote_identifier(name, quote)
        assert q[0] == quote and q[-1] == quote
        # unquote: strip wrapper, collapse doubled quote chars
        assert q[1:-1].replace(quote + quote, quote) == name

    @given(
        parts=st.lists(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=1,
                max_size=10,
            ),
            min_size=1,
            max_size=3,
        )
    )
    @settings(max_examples=50)
    def test_qualified_name_shape(self, parts):
        from cpt_database_sync_spark.sources.identifiers import qualified_name

        out = qualified_name(*parts)
        assert out == ".".join(f'"{p}"' for p in parts)
        # empty parts are skipped, as in the reference's catalog/schema handling
        assert qualified_name(None, *parts, quote="`") == ".".join(
            f"`{p}`" for p in parts
        )

    @given(name=st.text(max_size=30))
    @settings(max_examples=100)
    def test_escape_name_pattern_is_literal(self, name):
        """The escaped pattern must LIKE-match exactly the original name:
        every _ and % is escaped, every escape char is doubled."""
        from cpt_database_sync_spark.sources.identifiers import escape_name_pattern

        esc = escape_name_pattern(name, "\\")
        # decode the pattern back treating \ as the escape character
        out, i = [], 0
        while i < len(esc):
            if esc[i] == "\\":
                out.append(esc[i + 1])
                i += 2
            else:
                assert esc[i] not in ("_", "%") or name.count(esc[i]) == 0
                out.append(esc[i])
                i += 1
        assert "".join(out) == name

    @given(name=st.text(max_size=30))
    @settings(max_examples=100)
    def test_fold_case_matches_english_locale_upper(self, name):
        from cpt_database_sync_spark.sources.identifiers import fold_case

        assert fold_case(name, False) == name
        folded = fold_case(name, True)
        # locale-independent Unicode uppercase: ASCII folds a-z→A-Z,
        # accents fold (é→É), dotless-i surprises cannot happen
        assert folded == name.upper()
        assert fold_case("i", True) == "I"
        assert fold_case("café", True) == "CAFÉ"
        # idempotent: folding an already-folded name is a no-op
        assert fold_case(folded, True) == folded


class TestPngCodecProperties:
    @given(
        width=st.integers(min_value=1, max_value=80),
        height=st.integers(min_value=1, max_value=60),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    @settings(max_examples=60, deadline=None)
    def test_encode_decode_roundtrip_exact(self, width, height, seed):
        """make_png → decode_png_pixels must reconstruct the exact pixel
        pattern for ANY dimensions/seed — every scanline filter type
        (y % 5) and every edge shape (1-wide, 1-tall, non-multiple-of-
        filter-cycle heights) included."""
        from cpt_database_sync_spark.operators.multimodal import (
            decode_png_pixels,
            make_png,
            png_pixel,
        )

        m = decode_png_pixels(make_png(width, height, seed))
        assert (m["width"], m["height"], m["channels"]) == (width, height, 1)
        assert m["pixels"] == bytes(
            png_pixel(x, y, seed) for y in range(height) for x in range(width)
        )


class TestPrefixFilterTheorem:
    """Pure-python model of dedup_prefix_filter's candidate generation:
    the prefix bound |s| − ⌈t·|s|⌉ + 1 must NEVER miss a pair with
    Jaccard ≥ t (false negatives are silent data corruption at scale;
    false positives are only wasted verification work)."""

    @given(
        sets=st.lists(
            st.frozensets(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
            min_size=2,
            max_size=8,
        ),
        t=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
    )
    @settings(max_examples=300, deadline=None)
    def test_prefix_candidates_superset_of_true_pairs(self, sets, t):
        import math

        # one GLOBAL rarity order, ties by token id (mirrors the operator)
        freq: dict[int, int] = {}
        for s in sets:
            for g in s:
                freq[g] = freq.get(g, 0) + 1
        order = lambda g: (freq[g], g)  # noqa: E731

        def prefix(s):
            ordered = sorted(s, key=order)
            plen = len(s) - math.ceil(t * len(s)) + 1
            return set(ordered[:plen])

        prefixes = [prefix(s) for s in sets]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                if union and inter / union >= t:
                    assert prefixes[i] & prefixes[j], (
                        f"prefix filter missed a true pair: "
                        f"{sorted(sets[i])} ~ {sorted(sets[j])} at t={t}"
                    )


class TestSubstringDedupCover:
    """dedup_substring's window-cover formulation: a position is flagged
    iff some cross-doc-repeated K-window covers it. The ground truth it
    must reproduce EXACTLY (not just superset): a position belongs to a
    flagged region iff some substring of length ≥ K containing it also
    occurs in another document. False negatives are silent contamination
    (a repeated span survives excision); false positives excise unique
    text."""

    K = 4  # small K keeps the brute force tractable per example

    def _model_spans(self, docs):
        """The operator's algorithm, in pure python: repeated K-windows →
        covered positions → maximal runs."""
        K = self.K
        wins: dict[tuple, set] = {}
        for d, toks in enumerate(docs):
            for i in range(len(toks) - K + 1):
                wins.setdefault(tuple(toks[i : i + K]), set()).add(d)
        out = {}
        for d, toks in enumerate(docs):
            flagged = sorted(
                i
                for i in range(len(toks) - K + 1)
                if len(wins[tuple(toks[i : i + K])]) >= 2
            )
            spans, run = [], None
            for i in flagged:
                if run and i == run[1] + 1:
                    run[1] = i
                else:
                    if run:
                        spans.append((run[0], run[1] + K - 1))
                    run = [i, i]
            if run:
                spans.append((run[0], run[1] + K - 1))
            out[d] = spans
        return out

    def _truth_positions(self, docs):
        """Independent ground truth by brute force: every substring of
        length ≥ K of every doc, tested for occurrence in ANY other doc;
        flagged positions are the union of matching substrings' spans."""
        K = self.K
        out = {}
        for d, toks in enumerate(docs):
            flagged = set()
            others = [tuple(o) for e, o in enumerate(docs) if e != d]
            for i in range(len(toks)):
                for j in range(i + K, len(toks) + 1):
                    sub = tuple(toks[i:j])
                    found = any(
                        o[p : p + len(sub)] == sub
                        for o in others
                        for p in range(len(o) - len(sub) + 1)
                    )
                    if found:
                        flagged.update(range(i, j))
            out[d] = flagged
        return out

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        docs=st.lists(
            st.lists(
                st.integers(min_value=0, max_value=5), min_size=0, max_size=14
            ),
            min_size=2,
            max_size=4,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_window_cover_equals_brute_force(self, docs):
        docs = [[f"w{t}" for t in d] for d in docs]
        spans = self._model_spans(docs)
        truth = self._truth_positions(docs)
        for d in range(len(docs)):
            covered = set()
            for s, e in spans[d]:
                covered.update(range(s, e + 1))
            assert covered == truth[d], (
                f"doc {d}: model={sorted(covered)} truth={sorted(truth[d])} "
                f"docs={docs}"
            )

    def test_model_matches_spark_operator(self, spark, tmp_path):
        """Pin model ≡ operator on a planted corpus: a 15-token shared
        span, an exactly-K span, a (K-1) span that must NOT fire, and
        doc-edge spans."""
        import pandas as pd

        from cpt_database_sync_spark.operators import llm_dedup
        from cpt_database_sync_spark.operators.llm_dedup import dedup_substring

        K = llm_dedup.SUBSTRING_SPAN_TOKENS  # operator's K (12)
        shared15 = [f"s{i}" for i in range(15)]
        shared12 = [f"t{i}" for i in range(K)]
        shared11 = [f"u{i}" for i in range(K - 1)]
        docs = [
            shared15 + ["a1", "a2"] + shared11,                 # doc 0
            ["b1"] + shared15 + ["b2"],                         # doc 1: 15-span mid
            shared12,                                           # doc 2: exact-K doc
            ["c1", "c2"] + shared12,                            # doc 3: K at end
            ["d1"] + shared11 + ["d2", "d3", "d4"],             # doc 4: 11 < K
        ]
        d = tmp_path / "planted"
        d.mkdir()
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(t) for t in docs],
                "lang": ["en"] * len(docs),
                "quality": [1.0] * len(docs),
            }
        ).to_parquet(str(d / "documents.parquet"))
        got = {
            (r.doc_id, r.start_tok, r.end_tok, r.span_text)
            for r in dedup_substring(spark, str(d)).collect()
        }
        # model output (1-based positions like the operator)
        model = self._model_spans.__func__(
            type("S", (), {"K": K})(), docs
        )
        want = {
            (did, s + 1, e + 1, " ".join(docs[did][s : e + 1]))
            for did, spans in model.items()
            for s, e in spans
        }
        assert got == want, f"only-got={got - want} only-want={want - got}"


def test_substring_excise_keeps_canonical_copy(spark, tmp_path):
    """Keep-one-copy semantics: the lowest-doc_id owner of a repeated
    span keeps it verbatim; every other occurrence is excised; sub-K
    overlaps and unique text pass through untouched (modulo whitespace
    normalization, which is the op's documented contract)."""
    import pandas as pd

    from cpt_database_sync_spark.operators import llm_dedup
    from cpt_database_sync_spark.operators.llm_dedup import (
        dedup_substring_excise,
    )

    K = llm_dedup.SUBSTRING_SPAN_TOKENS
    shared = [f"s{i}" for i in range(K + 3)]          # 15-token span
    sub_k = [f"u{i}" for i in range(K - 1)]           # 11 tokens: no-op
    docs = [
        ["a1"] + shared + ["a2"],     # doc 0: canonical owner (min id)
        ["b1", "b2"] + shared,        # doc 1: copy -> excised
        sub_k + ["c1"],               # doc 2: sub-K repeat untouched
        ["d1"] + sub_k,               # doc 3: sub-K repeat untouched
    ]
    d = tmp_path / "excise"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(t) for t in docs],
            "lang": ["en"] * len(docs),
            "quality": [1.0] * len(docs),
        }
    ).to_parquet(str(d / "documents.parquet"))
    got = {
        r.doc_id: (r.n_removed, r.cleaned_text)
        for r in dedup_substring_excise(spark, str(d)).collect()
    }
    assert got[0] == (0, " ".join(docs[0])), "canonical copy must survive"
    assert got[1] == (len(shared), "b1 b2"), "non-owner copy must be excised"
    assert got[2] == (0, " ".join(docs[2]))
    assert got[3] == (0, " ".join(docs[3]))


class TestSkylineProperty:
    """Any-input guarantee for the skyline sort-sweep: on random point
    sets dense with coordinate ties (prices on a 9-value grid, sizes on
    a 7-value grid) plus NULL dimensions, ``pareto_sweep`` must equal
    the O(n^2) dominance definition exactly. The fixture-backed unit
    test can't manufacture adversarial tie/NULL density; this sweep
    does, deterministically (seeded), one tiny Spark job per trial."""

    def test_pareto_sweep_equals_bruteforce_on_random_ties(self, spark):
        import random

        from cpt_database_sync_spark.operators.relational import pareto_sweep

        rng = random.Random(20260815)
        for trial in range(12):
            n = rng.randint(0, 40)
            pts = []
            for i in range(n):
                price = (
                    None
                    if rng.random() < 0.08
                    else float(rng.randint(0, 8)) / 2.0
                )
                size = None if rng.random() < 0.08 else rng.randint(0, 6)
                pts.append((i, price, size))
            df = spark.createDataFrame(
                pts, "p_partkey bigint, p_retailprice double, p_size int"
            )

            def dominated(p):
                if p[1] is None or p[2] is None:
                    return False  # NULL dims satisfy no dominance predicate
                return any(
                    q[0] != p[0]
                    and q[1] is not None
                    and q[2] is not None
                    and (
                        (q[1] < p[1] and q[2] >= p[2])
                        or (q[1] <= p[1] and q[2] > p[2])
                    )
                    for q in pts
                )

            want = sorted(p[0] for p in pts if not dominated(p))
            got = sorted(r.p_partkey for r in pareto_sweep(df).collect())
            assert got == want, f"trial={trial} pts={pts}"


class TestBfsProperty:
    """Any-input guarantee for the frontier-join BFS core: on random
    digraphs (self-loops, cycles, disconnected components, empty graph)
    ``bfs_frontier`` must label exactly the nodes a queue BFS labels,
    with identical minimum hop counts, under the same hop bound."""

    def test_bfs_frontier_equals_queue_bfs_on_random_digraphs(self, spark):
        import random
        from collections import deque

        from cpt_database_sync_spark.operators.graph import bfs_frontier

        rng = random.Random(20260815)
        max_hops = 3
        for trial in range(8):
            n = rng.randint(1, 12)
            edges = sorted(
                {
                    (u, v)
                    for u in range(n)
                    for v in range(n)
                    if rng.random() < 0.15
                }
            )
            df = spark.createDataFrame(edges or [], "src int, dst int")
            got = sorted(
                (r.node, r.hops) for r in bfs_frontier(df, 0, max_hops).collect()
            )
            # queue BFS over the same graph; node 0 participates only if
            # it is an endpoint of some edge (the relation defines the
            # node set, matching the operator's contract)
            nodes = {x for e in edges for x in e}
            adj: dict[int, list[int]] = {}
            for u, v in edges:
                adj.setdefault(u, []).append(v)
            dist: dict[int, int] = {}
            if 0 in nodes:
                dist[0] = 0
                dq = deque([0])
                while dq:
                    u = dq.popleft()
                    if dist[u] >= max_hops:
                        continue
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = dist[u] + 1
                            dq.append(v)
            want = sorted(dist.items())
            assert got == want, f"trial={trial} edges={edges}"


class TestShuffleShardProperty:
    """Any-input guarantee for the training-shuffle core: on random id
    sets including 0, negatives, and int64 extremes, `shuffle_assign`
    must equal a pure-Python hashlib.md5 model exactly — shard, order,
    and positions. Pins the cross-engine md5/string-cast contract the
    DuckDB oracle relies on (str(bigint) has no sign/width surprises)."""

    def test_assign_matches_md5_model_on_random_ids(self, spark):
        import hashlib
        import random

        from cpt_database_sync_spark.operators.llm_text import (
            SHUFFLE_SALT,
            SHUFFLE_SHARDS,
            shuffle_assign,
        )

        rng = random.Random(20260815)
        extremes = [0, -1, 2**63 - 1, -(2**63), 42]
        for trial in range(8):
            n = rng.randint(0, 30)
            ids = set(extremes[: rng.randint(0, 5)])
            while len(ids) < n:
                ids.add(rng.randint(-(2**63), 2**63 - 1))
            rows = [(i,) for i in ids] or []
            df = spark.createDataFrame(rows, "doc_id bigint")

            model = []
            for i in ids:
                h = hashlib.md5(f"{SHUFFLE_SALT}{i}".encode()).hexdigest()
                model.append((int(h[:2], 16) % SHUFFLE_SHARDS, h, i))
            want = []
            by_shard: dict[int, list] = {}
            for shard, h, i in sorted(model, key=lambda t: (t[0], t[1], t[2])):
                by_shard.setdefault(shard, []).append((h, i))
            for shard, lst in by_shard.items():
                for pos, (_, i) in enumerate(lst, start=1):
                    want.append((shard, pos, i))

            got = [tuple(r) for r in shuffle_assign(df).collect()]
            assert sorted(got) == sorted(want), f"trial={trial} ids={ids}"
