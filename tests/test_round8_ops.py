"""Round-8 additions: content-defined-chunking dedup (shift-robustness
vs the fixed-stride chunker — the property that motivates CDC) and the
K-round GBDT loop (prefix-parity with the certified two-round
ml_boosted_stumps, monotone train MSE).
"""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_DIR

from recommedation_system_under_flink_spark import registry


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


# --------------------------------------------------- CDC dedup

#: Deterministic non-repeating template: every token distinct, so the
#: only chunk collisions are the real cross-doc duplicates.
_TEMPLATE = " ".join(f"w{i * i % 97}x{i}" for i in range(200))
#: 7-token novel prefix — shifts every fixed-stride window of doc 2,
#: but only the chunks overlapping it under content-defined cuts.
_PREFIX = "novel intro tokens never seen elsewhere q1"


def _write_docs(tmp_path, rows):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.sql(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)")
    con.close()


def test_cdc_shift_robust_where_fixed_stride_is_not(queries, spark, tmp_path):
    """Plant a template doc and a copy with a 7-token prefix insertion.
    Content-defined cuts re-align right after the insertion, so most
    of both docs' chunks are flagged duplicate; the fixed-stride
    chunker's windows all shift by 7 tokens and match nothing. This is
    the defining CDC property (LBFS), pinned as a behavioral diff
    between the two registered operators on identical input."""
    rows = [
        (1, _TEMPLATE, "en", "a", len(_TEMPLATE)),
        (2, _PREFIX + " " + _TEMPLATE, "en", "a", 7 + len(_TEMPLATE)),
        (3, " ".join(f"zz{i}" for i in range(80)), "en", "b", 400),
    ]
    _write_docs(tmp_path, rows)

    cdc = {
        r["doc_id"]: r
        for r in queries["dedup_cdc_chunks"](spark, str(tmp_path)).collect()
    }
    fixed = {
        r["doc_id"]: r
        for r in queries["dedup_chunk_ratio"](spark, str(tmp_path)).collect()
    }

    # CDC: everything downstream of the first post-insertion cut
    # re-aligns -> the overwhelming majority of chunks are shared.
    assert cdc[1]["dup_ratio"] >= 0.6, cdc[1]
    assert cdc[2]["dup_ratio"] >= 0.6, cdc[2]
    # the unrelated doc shares nothing
    assert cdc[3]["n_dup_chunks"] == 0
    # boundaries actually fired (not one whole-doc chunk)
    assert cdc[1]["n_chunks"] >= 4

    # fixed stride: the 7-token shift breaks every 64-token window
    assert fixed[2]["n_dup_chunks"] == 0, fixed[2]
    assert fixed[1]["n_dup_chunks"] == 0, fixed[1]


def test_cdc_boundaries_are_local_content(queries, spark, tmp_path):
    """Cut positions inside the shared suffix are IDENTICAL between the
    two docs once re-expressed relative to the template: the shared
    chunks are not a statistical accident but the realigned tail.
    Verified observably: doc 2's duplicated chunk count is at least
    doc 1's chunk count minus a small prefix-window allowance."""
    rows = [
        (1, _TEMPLATE, "en", "a", len(_TEMPLATE)),
        (2, _PREFIX + " " + _TEMPLATE, "en", "a", 7 + len(_TEMPLATE)),
    ]
    _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in queries["dedup_cdc_chunks"](spark, str(tmp_path)).collect()
    }
    # at most 2 chunks per doc may straddle the insertion region
    assert out[2]["n_dup_chunks"] >= out[1]["n_chunks"] - 2


# ------------------------------------------------ K-round GBDT

def test_gbdt_prefix_equals_boosted_stumps(queries, spark):
    """Stages 1-2 of the K-round loop are definitionally the certified
    two-round operator — same splits, same steps, same MSEs."""
    gbdt = queries["ml_gbdt_k_rounds"](spark, SF_DIR).collect()
    two = queries["ml_boosted_stumps"](spark, SF_DIR).collect()
    assert [r.asDict() for r in gbdt[:2]] == [r.asDict() for r in two]


def test_gbdt_train_mse_monotone(queries, spark):
    """Shrinkage < 1 with SSE-optimal splits never increases train MSE
    (each stage's step is a strict descent direction or zero)."""
    mses = [
        r["train_mse"]
        for r in queries["ml_gbdt_k_rounds"](spark, SF_DIR).collect()
    ]
    assert len(mses) == 4
    assert all(a >= b - 1e-9 for a, b in zip(mses, mses[1:])), mses


# ------------------------------------------- perceptual-hash dedup

def test_phash_planted_pairs(queries, spark, tmp_path):
    """doc_ids ≡ 0 (mod 3) map to modality 'image'. Plant: 3 and 6
    share an identical payload (hamming 0); 9 is 3 with a small
    localized perturbation (few cells change → small hamming); 12 is
    structurally different text. The exact-dup pair MUST surface with
    hamming 0; the perturbed pair must survive the ≤6 verdict; the
    unrelated image must pair with nobody."""
    # 640 chars -> 64 cells of 10 bytes. Alternating 'a'/'z' cells keep
    # every cell sum far from the grid mean (margin ~±8,000 after the
    # ×64 scaling), so single-cell edits flip exactly that cell's bit —
    # no borderline-threshold cascades.
    base_text = ("a" * 10 + "z" * 10) * 32
    # overwrite cell 30 (an 'a' cell) with 'z's: exactly 1 bit flips
    perturbed = base_text[:300] + "z" * 10 + base_text[310:]
    # uniform payload: all cells equal -> all bits 0 -> no band collides
    # with the alternating signature
    other = "m" * 640
    rows = [
        (3, base_text, "en", "a", 640),
        (6, base_text, "en", "a", 640),
        (9, perturbed, "en", "a", 640),
        (12, other, "en", "b", 640),
    ]
    _write_docs(tmp_path, rows)
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in queries["mm_phash_dedup"](spark, str(tmp_path)).collect()
    }
    assert pairs.get((3, 6)) == 0, pairs
    assert (3, 9) in pairs and pairs[(3, 9)] <= 6, pairs
    assert not any(12 in p for p in pairs), pairs


def test_phash_kernel_matches_documented_grid():
    """The numpy kernel IS the documented integer aHash: replay one
    payload by hand (chunk sums, ×64 threshold, band packing)."""
    from recommedation_system_under_flink_spark.operators.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        PHASH_CELLS,
        _phash_bands,
    )

    payload = bytes((i * 37 + 11) % 256 for i in range(200))
    n = len(payload)
    chunk = max(1, n // PHASH_CELLS)
    cells = [
        sum(payload[g * chunk : (g + 1) * chunk])
        for g in range(PHASH_CELLS)
    ]
    total = sum(cells)
    bits = [int(c * PHASH_CELLS > total) for c in cells]
    expect = [
        sum(
            bits[k * PHASH_BAND_BITS + j] << j
            for j in range(PHASH_BAND_BITS)
        )
        for k in range(PHASH_BANDS)
    ]
    assert _phash_bands(payload) == expect
    assert _phash_bands(b"") is None


# ---------------------------------------------- NN-descent round

def test_nndescent_recall_monotone_and_improving(queries, spark):
    """The refined candidate set contains every current edge, so per
    query the refined top-K recall can never drop (displacement only
    by items that are themselves in the exact top-K). On the sf0.001
    fixture at least one query must actually improve — otherwise the
    round is a no-op and the operator demonstrates nothing."""
    rows = queries["sim_nndescent_round"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["recall_refined"] >= r["recall_init"] for r in rows), rows
    assert any(r["recall_refined"] > r["recall_init"] for r in rows), rows


def test_nndescent_init_recall_equals_lsh_topk(queries, spark):
    """g0 restricted to the evaluation queries IS sim_lsh_topk (same
    pinned hyperplanes, same quantized ranking), so recall_init must
    equal the recall computed externally from sim_lsh_topk's pairs
    against sim_bruteforce_topk's exact pairs — cross-operator
    consistency through public outputs only."""
    from recommedation_system_under_flink_spark.operators.similarity import (
        TOP_K,
    )

    nnd = {
        r["query_id"]: r["recall_init"]
        for r in queries["sim_nndescent_round"](spark, SF_DIR).collect()
    }
    lsh = {
        (r["query_id"], r["corpus_id"])
        for r in queries["sim_lsh_topk"](spark, SF_DIR).collect()
    }
    exact = {
        (r["query_id"], r["corpus_id"])
        for r in queries["sim_bruteforce_topk"](spark, SF_DIR).collect()
    }
    for q in nnd:
        hits = sum(1 for p in exact if p[0] == q and p in lsh)
        assert abs(nnd[q] - hits / TOP_K) < 1e-9, (q, nnd[q], hits)


def test_cdc_short_documents_survive(queries, spark, tmp_path):
    """Documents shorter than the CDC_W=4-token rolling window have no
    boundary candidates — one whole-doc chunk, exactly like the
    oracle's empty range(W, len+1). Regression for the round-8 review
    finding: Spark's sequence(4, size) counts DOWNWARD when size < 4
    and the descending candidates hit slice start 0 (a crash)."""
    rows = [
        (1, "one", "en", "a", 3),
        (2, "two words", "en", "a", 9),
        (3, "exactly three tokens", "en", "a", 20),
        (4, "exactly four whole tokens", "en", "a", 25),
        (5, "one", "en", "b", 3),  # exact dup of doc 1's single chunk
    ]
    _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in queries["dedup_cdc_chunks"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    for d in (1, 2, 3):
        assert out[d]["n_chunks"] == 1, out[d]
    assert out[1]["n_dup_chunks"] == 1 and out[5]["n_dup_chunks"] == 1
    assert out[2]["n_dup_chunks"] == 0


# --------------------------------------------- cross-validated ridge


def test_cv_ridge_matches_numpy_replay(queries, spark):
    """Ground truth: refit every (fold, lambda) cell with numpy's
    linear solver on the exact same features/folds and require the
    engine's Cramer-solved weights and held-out MSE to agree."""
    import numpy as np

    from recommedation_system_under_flink_spark.operators.ml import (
        RIDGE_CV_LAMBDAS,
    )
    from recommedation_system_under_flink_spark.operators.sampling import (
        HASH_MOD,
        HASH_MULT,
        KFOLD_K,
    )

    got = {
        (round(r["ridge_lambda"], 6), r["fold"]): r
        for r in queries["ml_cv_ridge_path"](spark, SF_DIR).collect()
    }
    assert len(got) == KFOLD_K * len(RIDGE_CV_LAMBDAS)

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    X, y, fold = [], [], []
    for doc_id, text, lang, n_chars in rows:
        ntok = len([t for t in text.split(" ") if t != ""])
        X.append([1.0, n_chars / 500.0, ntok / 50.0, n_chars / (ntok * 10.0)])
        y.append(1.0 if lang == "en" else 0.0)
        fold.append((doc_id * HASH_MULT) % HASH_MOD % KFOLD_K)
    X, y, fold = np.array(X), np.array(y), np.array(fold)

    for lam in RIDGE_CV_LAMBDAS:
        for k in range(KFOLD_K):
            tr, te = fold != k, fold == k
            w = np.linalg.solve(
                X[tr].T @ X[tr] + lam * np.eye(4), X[tr].T @ y[tr]
            )
            mse = float(np.mean((y[te] - X[te] @ w) ** 2))
            r = got[(lam, k)]
            assert r["n_test"] == int(te.sum())
            eng_w = [r["w_bias"], r["w_x1"], r["w_x2"], r["w_x3"]]
            assert np.allclose(eng_w, w, atol=2e-5), (lam, k, eng_w, w)
            assert abs(r["test_mse"] - mse) < 2e-5, (lam, k)


def test_cv_ridge_shrinkage_monotone(queries, spark):
    """Uniform-diagonal ridge: the coefficient norm must be
    non-increasing in lambda within every fold, and the folds must
    partition the corpus."""
    rows = queries["ml_cv_ridge_path"](spark, SF_DIR).collect()
    by_fold: dict[int, list] = {}
    for r in rows:
        by_fold.setdefault(r["fold"], []).append(r)
    for fold_rows in by_fold.values():
        fold_rows.sort(key=lambda r: r["ridge_lambda"])
        norms = [
            r["w_bias"] ** 2 + r["w_x1"] ** 2 + r["w_x2"] ** 2 + r["w_x3"] ** 2
            for r in fold_rows
        ]
        assert norms == sorted(norms, reverse=True)
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    per_fold = {r["fold"]: r["n_test"] for r in rows}
    assert sum(per_fold.values()) == n_docs


# --------------------------------------------- line-level dedup


def test_line_level_removes_all_copies_and_rebuilds(queries, spark, tmp_path):
    """Plant one 16-token line shared by three docs (twice in one of
    them). The corpus-frequency policy must remove EVERY copy —
    including the first occurrence, unlike dedup_span_scrub's
    keep-first rule — and rebuild each doc from its surviving lines
    in order (md5-checked against a Python replay)."""
    import hashlib

    from recommedation_system_under_flink_spark.operators.dedup import (
        BOILER_MIN_DOCS,
        LINE_SIZE,
    )

    assert LINE_SIZE == 16 and BOILER_MIN_DOCS == 2  # fixture geometry
    line_a = " ".join(f"boiler{i}" for i in range(16))
    u1 = " ".join(f"uniq1x{i}" for i in range(16))
    u2 = " ".join(f"uniq2x{i}" for i in range(16))
    u3 = " ".join(f"uniq3x{i}" for i in range(32))
    rows = [
        (1, f"{u1} {line_a}", "en", "feed", 10),
        (2, f"{line_a} {u2}", "en", "feed", 10),
        (3, u3, "en", "feed", 10),
        (4, f"{line_a} {line_a}", "en", "feed", 10),
    ]
    _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in queries["dedup_line_level"](spark, str(tmp_path)).collect()
    }

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1]["n_lines"] == 2 and out[1]["n_removed"] == 1
    assert out[1]["kept_md5"] == md5(u1)
    assert out[2]["n_removed"] == 1 and out[2]["kept_md5"] == md5(u2)
    assert out[3]["n_removed"] == 0 and out[3]["kept_md5"] == md5(u3)
    # every copy goes, even within one doc; the rebuild is empty
    assert out[4]["n_lines"] == 2 and out[4]["n_removed"] == 2
    assert out[4]["kept_md5"] == md5("")
    assert out[4]["removed_ratio"] == 1.0


# ----------------------------------------------- DP histogram release


def test_dp_release_matches_python_replay(queries, spark):
    """Ground truth: replay the pinned-hash Laplace draw per cell with
    hashlib + math and require identical noise/releases; pin the
    mechanism invariants (clamp at 0, zero-noise-free, symmetric sign
    mix across ~99 cells)."""
    import hashlib
    import math

    from recommedation_system_under_flink_spark.operators.profiling import (
        DP_EPSILON,
        DP_RELEASE_TAG,
    )

    rows = queries["prof_dp_release"](spark, SF_DIR).collect()
    truth = {
        (lang, source): n
        for lang, source, n in duckdb.sql(
            f"SELECT lang, source, count(*) FROM "
            f"'{SF_DIR}/documents.parquet' GROUP BY 1, 2"
        ).fetchall()
    }
    assert len(rows) == len(truth)
    n_neg = 0
    for r in rows:
        h = int(
            hashlib.md5(
                f"{DP_RELEASE_TAG}|{r['lang']}|{r['source']}".encode()
            ).hexdigest()[:8],
            16,
        )
        u = (h + 0.5) / 2**32
        noise = (
            math.log(2 * u) / DP_EPSILON
            if u < 0.5
            else -math.log(2 - 2 * u) / DP_EPSILON
        )
        assert abs(r["noise"] - noise) < 2e-6, (r, noise)
        assert r["n_true"] == truth[(r["lang"], r["source"])]
        assert abs(r["n_released"] - max(0.0, r["n_true"] + noise)) < 2e-6
        assert r["n_released"] >= 0.0
        n_neg += noise < 0
    # Laplace is symmetric: both signs must actually occur.
    assert 0 < n_neg < len(rows)


# ------------------------------------------------- multi-probe LSH


def test_multiprobe_superset_and_replay(queries, spark):
    """Numpy replay of the whole multi-probe chain: the probe-bucket
    candidate set must strictly contain the same-table single-probe
    set, mean recall@5 vs exact brute force must not decrease, and the
    engine's top-k pairs must equal the replay's."""
    import numpy as np

    from recommedation_system_under_flink_spark.operators.similarity import (
        LSH_BITS,
        MP_TABLES,
        N_QUERIES,
        TOP_K,
        _hyperplanes,
    )

    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"'{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in data])
    X = np.array([r[1] for r in data])
    planes = _hyperplanes(MP_TABLES, LSH_BITS)
    sig = np.zeros((MP_TABLES, len(ids)), dtype=int)
    for t in range(MP_TABLES):
        for b in range(LSH_BITS):
            sig[t] += (X @ planes[t][b] > 0).astype(int) << b

    def topk(cands_by_q):
        cos = (X @ X.T) / (
            np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(X, axis=1)[None, :]
        )
        out = {}
        for q, cs in cands_by_q.items():
            ranked = sorted(cs, key=lambda c: (-round(cos[q, c], 6), ids[c]))
            out[q] = [ids[c] for c in ranked[:TOP_K]]
        return out

    home, multi = {}, {}
    for q in range(N_QUERIES):
        h_set, m_set = set(), set()
        for t in range(MP_TABLES):
            probes = {sig[t][q]} | {
                sig[t][q] ^ (1 << b) for b in range(LSH_BITS)
            }
            h_set |= {c for c in range(len(ids)) if c != q and sig[t][c] == sig[t][q]}
            m_set |= {c for c in range(len(ids)) if c != q and sig[t][c] in probes}
        home[q], multi[q] = h_set, m_set
        assert h_set <= m_set
    assert sum(len(multi[q]) for q in multi) > sum(len(home[q]) for q in home)

    exact = topk({q: [c for c in range(len(ids)) if c != q] for q in range(N_QUERIES)})
    rec = lambda got: np.mean(  # noqa: E731
        [len(set(got[q]) & set(exact[q])) / TOP_K for q in range(N_QUERIES)]
    )
    assert rec(topk(multi)) >= rec(topk(home))

    got = queries["sim_multiprobe_lsh_topk"](spark, SF_DIR).collect()
    got_pairs = {(r["query_id"], r["corpus_id"]) for r in got}
    want_pairs = {
        (q, c) for q, cs in topk(multi).items() for c in cs
    }
    assert got_pairs == want_pairs


# --------------------------------------------------- video scene cuts


def test_scene_cuts_planted_boundary(queries, spark, tmp_path):
    """Plant a video whose payload flips from all-'a' bytes to all-'z'
    halfway: the two frames spanning the flip must be the ONLY cuts,
    and a uniform video must have none. Signatures replayed exactly."""
    from recommedation_system_under_flink_spark.operators.multimodal import (
        SCENE_CUT_TAU,
    )

    # doc_id % 3 == 2 -> modality 'video'; n_chars >= 250 -> 11 frames
    rows = [
        (2, "a" * 275 + "z" * 275, "en", "feed", 550),
        (5, "m" * 550, "en", "feed", 550),
    ]
    _write_docs(tmp_path, rows)
    out = queries["mm_scene_cuts"](spark, str(tmp_path)).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r
    assert set(by) == {2, 5}
    assert set(by[2]) == set(range(11))

    # replay: chunk = 550 // 11 = 50; frames 0-4 'a', 5 mixed, 6-10 'z'
    a, z = ord("a") / 255.0, ord("z") / 255.0
    expect = [a] * 5 + [(ord("a") * 25 + ord("z") * 25) / (255.0 * 50)] + [z] * 5
    for k in range(11):
        assert abs(by[2][k]["sig"] - expect[k]) < 1e-6
    cuts = {k for k, r in by[2].items() if r["is_cut"]}
    assert cuts == {5, 6}
    assert abs(expect[5] - expect[4]) > SCENE_CUT_TAU  # fixture really crosses
    assert by[2][0]["delta"] is None and not by[2][0]["is_cut"]
    assert not any(r["is_cut"] for r in by[5].values())


# -------------------------------------------------- novelty report


def test_novelty_report_replay_and_bounds(queries, spark):
    """Recompute every user's mean self-information from the engine's
    own recommendation lists plus a DuckDB popularity recount; pin the
    information-theoretic bounds 0 <= bits <= log2(|users|)."""
    import math

    recs = queries["cf_user_recommendations"](spark, SF_DIR).collect()
    out = {r["user_id"]: r for r in queries["cf_novelty_report"](spark, SF_DIR).collect()}

    from recommedation_system_under_flink_spark.sources.tables import CLICKS_CTE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    pop = dict(
        con.execute(
            f"WITH {CLICKS_CTE}, prefs AS "
            "(SELECT DISTINCT user_id, news_id FROM clicks) "
            "SELECT news_id, COUNT(*) FROM prefs GROUP BY news_id"
        ).fetchall()
    )
    n_users = con.execute(
        f"WITH {CLICKS_CTE} SELECT COUNT(DISTINCT user_id) FROM clicks"
    ).fetchone()[0]
    con.close()

    by_user: dict[int, list] = {}
    for r in recs:
        by_user.setdefault(r["user_id"], []).append(r["news_id"])
    assert set(by_user) == set(out)
    for uid, items in by_user.items():
        bits = [math.log2(n_users / pop[i]) for i in items]
        share = [pop[i] / n_users for i in items]
        got = out[uid]
        assert got["n_recs"] == len(items)
        assert abs(got["mean_novelty_bits"] - sum(bits) / len(bits)) < 2e-6
        assert abs(got["mean_pop_share"] - sum(share) / len(share)) < 2e-6
        # engine value is 6-dp rounded, so allow the rounding quantum
        assert 0.0 <= got["mean_novelty_bits"] <= math.log2(n_users) + 1e-6
        assert 0.0 < got["mean_pop_share"] <= 1.0


# ------------------------------------- overflow-safe portable hash


def test_split_hash_congruent_and_overflow_safe(queries, spark, tmp_path):
    """The round-8 overflow fix: split_hash must equal the plain
    (id * HASH_MULT) % 2^32 (arbitrary-precision ground truth) for
    every id, while surviving the >= 3.5e9 id regime where the plain
    BIGINT product wraps in Spark and raises in DuckDB."""
    from recommedation_system_under_flink_spark.operators.sampling import (
        HASH_MOD,
        HASH_MULT,
        MIX_LO,
        split_hash_sql,
    )

    big_ids = [
        3_470_000_000,          # just under the old 2^63 overflow line
        4_294_967_295,          # 2^32 - 1
        4_300_000_007,          # past 2^32
        2**40 + 123,
        2**62 + 99,
    ]
    # 1) pure congruence, arbitrary precision vs the decomposition
    for i in list(range(2000)) + big_ids:
        r = i % HASH_MOD
        hi, lo = r // MIX_LO, r % MIX_LO
        dec = (((hi * HASH_MULT) % MIX_LO) * MIX_LO + lo * HASH_MULT) % HASH_MOD
        assert dec == (i * HASH_MULT) % HASH_MOD, i

    # 2) the old raw form really was the cross-engine hazard
    with pytest.raises(Exception):
        duckdb.sql(
            f"SELECT (CAST(4300000007 AS BIGINT) * {HASH_MULT}) % {HASH_MOD}"
        ).fetchone()

    # 3) end-to-end: engine vs oracle agree on fold assignment for
    # huge doc_ids (the exact divergence the round-7 advice described)
    rows = [(i, "t", "en", "feed", 1) for i in big_ids]
    _write_docs(tmp_path, rows)
    got = {
        r["doc_id"]: r["fold"]
        for r in queries["samp_kfold_assign"](spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    from recommedation_system_under_flink_spark.registry import _REGISTRY

    want = dict(
        con.execute(
            f"SELECT doc_id, fold FROM ({_REGISTRY['samp_kfold_assign'].oracle})"
        ).fetchall()
    )
    con.close()
    assert got == want and len(got) == len(big_ids)
    for i in big_ids:  # ground truth once more, exact arithmetic
        assert got[i] == (i * HASH_MULT) % HASH_MOD % 5
