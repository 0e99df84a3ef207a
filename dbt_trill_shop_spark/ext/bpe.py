"""BPE tokenizer induction over the corpus (Sennrich et al. 2016) —
the tokenizer-training step of an LLM data pipeline, run as Spark jobs.

Classic BPE trains on the *distinct-word frequency table*, not the corpus:
one corpus pass builds (word, freq), and every merge iteration then touches
only vocab-bounded data.  That is exactly the shape that survives 100 TB —
the corpus-sized work is a single tokenize + groupBy(word) (shuffle keyed on
the word, combiner-aggregated map-side), after which ``max_vocab`` rows ride
through the merge loop.  Per iteration: one vocab-sized pair-count aggregate
(adjacent-pair explode -> groupBy -> sum(freq)) and ONE driver-side collect
of a single row (the argmax pair) — bounded at any corpus size, the same
"tiny argmax to the driver" idiom as ``kmeans_refine``.

Symbol sequences are kept as STRINGS, each token wrapped in a sentinel
(``\\x1f`` + token + ``\\x1f``), so a merge is one ``replace()`` of
``\\x1fl\\x1f\\x1fr\\x1f`` with ``\\x1flr\\x1f``.  The per-token wrapping makes
consecutive matches share no characters, so the engine's leftmost
non-overlapping ``replace`` merges a run ``a a a a`` into ``aa aa`` exactly
like the reference greedy fold — and DuckDB's ``replace`` has the same
semantics, which is what makes the chained-CTE oracle bit-exact.

Reference scope: the dbt reference (Muizzkolapo/dbt-trill-shop) has no
tokenizer surface — this is driver-north-star extension territory
(SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localrel import values_relation

SEP = "\x1f"  # unit separator: never produced by the [a-z]+ tokenizer

_WORD_SPLIT = "[^a-z]+"


def word_frequencies(docs: DataFrame, max_vocab: int, text_col: str = "text") -> DataFrame:
    """Top-``max_vocab`` (word, freq) from the corpus — the ONE corpus-sized
    pass.  Total order (freq desc, word asc) makes the cut deterministic."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(max_vocab)
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    max_vocab: int = 2000,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns one row per merge:
    (merge_rank, lhs, rhs, pair_count), rank-ordered.

    Ties break (count desc, lhs asc, rhs asc) — tokens are [a-z]+ only
    (the ``_WORD_SPLIT`` tokenizer), so Python/Spark/DuckDB string
    comparison is the identical byte order and the learned merge table is
    engine-exact.

    The word table is ``max_vocab`` rows BY CONSTRUCTION (corpus-size
    independent — the one corpus-sized pass is :func:`word_frequencies`),
    so the merge loop runs DRIVER-SIDE over the collected words (EAGER:
    the corpus pass executes at call time, and the Python pair counts are
    exact unbounded ints — engine parity assumes they fit int64, which
    max_vocab·word_len bounds by construction): pair
    counting is exact integer sums, the argmax tie-break is total, and
    the merge rewrite is the same leftmost-non-overlapping literal
    replace (str.replace == F.replace semantics, guarded by
    test_bpe_run_merging_is_leftmost_nonoverlapping's planted twin).  The
    former per-merge Spark rounds — an explode/groupBy/TakeOrdered
    argmax plus a replace+checkpoint, ~2 jobs × n_merges over the
    2000-row relation — were pure scheduler machinery (the
    pca_top_component recipe)."""
    spark = docs.sparkSession
    freq_rows = word_frequencies(docs, max_vocab, text_col).collect()
    # SEP-wrap every char (initial symbols): "ab" -> "␟a␟␟b␟"
    words = [
        ("".join(SEP + ch + SEP for ch in r["w"]), int(r["freq"]))
        for r in freq_rows
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, freq in words:
            toks = [t for t in s.split(SEP) if t]
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, cnt))
        pat = SEP + lhs + SEP + SEP + rhs + SEP
        rep = SEP + lhs + rhs + SEP
        words = [(s.replace(pat, rep), freq) for s, freq in words]
    return values_relation(
        spark, merges, "merge_rank BIGINT, lhs STRING, rhs STRING, pair_count BIGINT"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to the corpus: per document, the BPE
    token count and the segmented first word (smoke surface for serving).
    Merges apply in rank order as chained ``replace`` — a narrow,
    shuffle-free projection however large the corpus."""
    enc = F.regexp_replace(
        F.lower(F.col(text_col)), "(" + _WORD_SPLIT + ")|(.)", SEP + "$2" + SEP
    )
    col = enc
    for lhs, rhs in merges:
        col = F.replace(
            col,
            F.lit(SEP + lhs + SEP + SEP + rhs + SEP),
            F.lit(SEP + lhs + rhs + SEP),
        )
    toks = F.filter(F.split(col, SEP), lambda x: x != F.lit(""))
    return docs.select(
        F.col(id_col), F.size(toks).cast("bigint").alias("n_bpe_tokens")
    )


def bpe_merges_sql(n_merges: int = 8, max_vocab: int = 2000) -> str:
    """DuckDB oracle: the identical algorithm as chained CTEs — per
    iteration a pair-count aggregate, a 1-row argmax, and a cross-join
    replace — UNION'd into the rank-ordered merge table."""
    parts = [
        f"""
WITH words AS (
    SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '{_WORD_SPLIT}')) AS w
        FROM documents
    ) WHERE w <> ''
    GROUP BY w ORDER BY freq DESC, w ASC LIMIT {max_vocab}
),
w0 AS (
    SELECT regexp_replace(w, '(.)', chr(31)||'\\1'||chr(31), 'g') AS s, freq
    FROM words
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
p{i} AS (
    SELECT pr[1] AS lhs, pr[2] AS rhs, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM (
        SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:])) AS pr, freq
        FROM (
            SELECT list_filter(string_split(s, chr(31)), x -> x <> '') AS toks,
                   freq
            FROM w{i - 1}
        )
    )
    GROUP BY 1, 2
),
t{i} AS (SELECT lhs, rhs, pair_count FROM p{i}
         ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
w{i} AS (
    SELECT replace(w{i - 1}.s,
                   chr(31)||t{i}.lhs||chr(31)||chr(31)||t{i}.rhs||chr(31),
                   chr(31)||t{i}.lhs||t{i}.rhs||chr(31)) AS s,
           freq
    FROM w{i - 1}, t{i}
)"""
        )
    unions = "\n    UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, pair_count FROM t{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f"\nSELECT * FROM (\n    {unions}\n) ORDER BY merge_rank")
    return "".join(parts)


def bpe_segment_sql(merges: list[tuple[str, str]]) -> str:
    """DuckDB oracle for :func:`bpe_segment` with a *given* merge table."""
    col = f"regexp_replace(lower(text), '({_WORD_SPLIT})|(.)', chr(31)||'\\2'||chr(31), 'g')"
    for lhs, rhs in merges:
        col = (
            f"replace({col}, chr(31)||'{lhs}'||chr(31)||chr(31)||'{rhs}'||chr(31),"
            f" chr(31)||'{lhs}{rhs}'||chr(31))"
        )
    return f"""
SELECT doc_id,
       CAST(len(list_filter(string_split({col}, chr(31)), x -> x <> '')) AS BIGINT)
           AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer EM (Kudo 2018, SentencePiece's unigram model) — the
# r13-shortlist item whose hard part is CROSS-ENGINE DETERMINISM: every EM
# quantity is an exact integer (piece costs in micro-nats, Viterbi totals as
# int64 sums) and every argmin/argmax carries a total tie-break, so Spark and
# the generated DuckDB oracle replay the identical algebra.


_VITERBI_BIG = 1 << 40  # infeasible-span cost: never beats a feasible path


def _dp_expr(piece_max_len: int) -> str:
    """Forward Viterbi DP as ONE SQL expression over the word column ``w``
    and a cost-map column ``_cm``: ``aggregate`` over positions builds the
    dp array, each step an ``array_min`` over the ≤ piece_max_len candidate
    spans — struct-lexicographic on (total, j), so cost ties prefer the
    LONGER piece.  Spans absent from the map cost 2^40: they can never win
    while any feasible candidate exists, and when NONE is feasible (a char
    outside the vocabulary) the tie-break still makes the choice total."""
    return f"""
        aggregate(
          sequence(1, length(w)),
          array(named_struct('total', CAST(0 AS BIGINT), 'j', -1, 'l', 0)),
          (acc, i) -> array_append(acc,
            array_min(transform(sequence(1, least(i, {int(piece_max_len)})),
              l -> named_struct(
                'total', acc[i - l].total
                         + coalesce(_cm[substring(w, i - l + 1, l)],
                                    CAST({_VITERBI_BIG} AS BIGINT)),
                'j', i - l,
                'l', l)))))
        """


_BT_EXPR = """
        aggregate(
          sequence(1, length(w)),
          named_struct('pos', length(w), 'ps', CAST(array() AS ARRAY<STRING>)),
          (acc, x) -> IF(acc.pos > 0,
            named_struct(
              'pos', _dp[acc.pos].j,
              'ps', array_append(acc.ps,
                        substring(w, _dp[acc.pos].j + 1, _dp[acc.pos].l))),
            acc)).ps
        """


def _with_viterbi(words: DataFrame, costs: dict, piece_max_len: int) -> DataFrame:
    """``words`` (needs a ``w`` column) extended with ``_dp`` (the dp
    array) and ``_ps`` (the segmentation pieces).  The cost table rides as
    a ``map(...)`` literal (vocab-bounded — the kmeans-centroid-broadcast
    idiom), so the whole DP runs inside one whole-stage-codegen expression
    per word: no joins, no shuffles.

    The map is built as ONE SQL string parsed JVM-side rather than
    ``create_map`` over 2·|vocab| ``F.lit`` Columns: each ``lit`` is a py4j
    round-trip, and at ~320 vocab entries the Column-by-Column build cost
    ~0.8 s of pure driver/py4j time PER E-STEP (measured; the parse path is
    milliseconds).  Pieces are [a-z]+ substrings (the tokenizer strips
    everything else), so plain single-quoting is lossless; values ride as
    ``...L`` bigint literals, the type the DP's int64 totals use anyway."""
    map_expr = "map(" + ", ".join(
        f"'{p}', {int(c)}L" for p, c in sorted(costs.items())
    ) + ")"
    return (
        words.withColumn("_cm", F.expr(map_expr))
        .withColumn("_dp", F.expr(_dp_expr(piece_max_len)))
        .withColumn("_ps", F.expr(_BT_EXPR))
    )


def _viterbi_usage(words: DataFrame, costs: dict, piece_max_len: int) -> DataFrame:
    """E-step: per-word Viterbi segmentation under the current piece costs,
    rolled up to per-piece usage counts (weighted by word frequency)."""
    return (
        _with_viterbi(words, costs, piece_max_len)
        .select("freq", F.explode("_ps").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("usage"))
    )


def unigram_lm_em(
    docs: DataFrame,
    max_vocab: int = 400,
    n_pieces: int = 160,
    piece_max_len: int = 4,
    word_max_len: int = 12,
    em_rounds: int = 2,
    top_out: int = 48,
    text_col: str = "text",
    keep_pieces: int | None = None,
) -> DataFrame:
    """Unigram-LM tokenizer vocabulary via EM (Kudo 2018): seed the piece
    inventory with the corpus's most frequent substrings (length 1..
    ``piece_max_len``) of the top-``max_vocab`` words, then alternate
    Viterbi segmentation (E) with count re-estimation (M); returns the
    ``top_out`` pieces by final usage as (piece, usage, cost_micro).

    Determinism contract (the hard part — SentencePiece breaks ties by
    float likelihood): piece costs are ln-of-integer micro-nats rounded
    once; Viterbi totals are int64 sums of those ints with the
    (total, j) struct-lexicographic tie-break; the M-step is add-one
    smoothed over the FULL seed vocabulary (no piece ever reaches
    ln(0), and zero-usage pieces just decay) — so both engines pick
    identical segmentations and identical final tables.

    Scale shape: ONE corpus-sized pass (the word-frequency groupBy,
    map-side combined); everything after is vocab-bounded — candidate
    counts are (words × L × P) integer rows, the EM loop's driver
    collects are ≤ vocab-sized (the bpe_merges / kmeans_refine idiom),
    and the E-step is a single codegen stage over the word table."""
    spark = docs.sparkSession
    out_schema = "piece string, usage bigint, cost_micro bigint"
    costs, final_rows = _unigram_em_costs(
        docs, max_vocab, n_pieces, piece_max_len, word_max_len, em_rounds,
        text_col, keep_pieces=keep_pieces,
    )
    if not final_rows:  # degenerate corpus: no words survive the cut
        return values_relation(spark, [], out_schema)
    table = values_relation(
        spark,
        sorted((r["piece"], int(r["usage"]), int(r["cost"])) for r in final_rows),
        out_schema,
    )
    return (
        table.orderBy(F.desc("usage"), F.asc("piece"))
        .limit(int(top_out))
        .select("piece", "usage", "cost_micro")
    )


def _norm_costs(spark, rows: list) -> list:
    """Piece costs ``round((ln(tot) - ln(cnt)) * 1e6)`` over driver-side
    ``(piece, cnt, usage)`` rows; ``tot = Σ cnt`` summed exactly in Python
    (int64 algebra — identical to the former ``agg(sum)``), while ln/round
    remain the SAME Spark expressions, evaluated over a local relation:
    Catalyst's ConvertToLocalRelation folds the projection driver-side with
    the identical Log/Round semantics, so no job, no broadcast exchange,
    and bit-equal costs to the former crossJoin(broadcast(agg)) shape."""
    tot = sum(cnt for _, cnt, _ in rows)
    return (
        values_relation(spark, rows, "piece string, cnt long, usage long")
        .select(
            "piece",
            "usage",
            F.round(
                (
                    F.log(F.lit(tot).cast("double"))
                    - F.log(F.col("cnt").cast("double"))
                )
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("cost"),
        )
        .collect()
    )


def _unigram_em_costs(
    docs: DataFrame,
    max_vocab: int,
    n_pieces: int,
    piece_max_len: int,
    word_max_len: int,
    em_rounds: int,
    text_col: str,
    keep_pieces: int | None = None,
) -> tuple[dict, list]:
    """The EM training loop shared by :func:`unigram_lm_em` (vocabulary
    report) and :func:`unigram_fertility` (corpus-wide application):
    returns (final piece→cost_micro dict, final collected M-step rows).

    ``keep_pieces`` enables the SentencePiece PRUNING round: after every
    E-step the live vocabulary shrinks to the top-``keep_pieces`` pieces
    by (usage DESC, piece ASC) UNION all single-char pieces (the
    feasibility floor — every word must stay segmentable), and the
    M-step's add-one smoothing runs over the SURVIVORS only, so costs
    renormalize to the pruned inventory.  ``None`` (default) keeps the
    full seed vocabulary every round — the original behavior, unchanged
    for the staged x_unigram_lm_em / x_unigram_fertility paths."""
    spark = docs.sparkSession
    words = (
        word_frequencies(docs, max_vocab, text_col)
        .filter(F.length("w") <= word_max_len)
        .localCheckpoint(eager=True)
    )
    P, L = int(piece_max_len), int(word_max_len)
    subs = words.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), "
                f"i -> transform(sequence(1, least({P}, length(w) - i + 1)), "
                f"l -> substring(w, i, l))))"
            )
        ).alias("piece"),
    )
    cand = subs.groupBy("piece").agg(F.sum("freq").cast("bigint").alias("cnt"))
    topv = cand.orderBy(F.desc("cnt"), F.asc("piece")).limit(int(n_pieces))
    singles = cand.filter(F.length("piece") == 1)
    vocab0 = (
        topv.unionByName(singles).groupBy("piece").agg(F.max("cnt").alias("cnt"))
    )
    # The normalizer ``tot`` is an exact int64 sum, so collect the
    # vocab-bounded rows once and sum in Python instead of
    # crossJoin(broadcast(agg)): the broadcast exchange is a whole extra
    # job + broadcast build per normalization, ~0.5-1.5 s of machinery for
    # a <=|vocab|-row relation (measured; the arithmetic itself is free).
    # ln/round stay Spark expressions over a LOCAL relation — Catalyst
    # constant-folds them driver-side with the identical Log/Round
    # semantics, so every cost value is bit-equal to the former
    # distributed evaluation (the cross-engine determinism contract).
    vocab_rows = vocab0.collect()
    if not vocab_rows:  # degenerate corpus: no words survive the cut
        return {}, []
    cost_rows = _norm_costs(
        spark,
        sorted((r["piece"], int(r["cnt"]), int(r["cnt"])) for r in vocab_rows),
    )
    costs = {r["piece"]: int(r["cost"]) for r in cost_rows}
    final_rows: list = []
    for _ in range(int(em_rounds)):
        usage = {
            r["piece"]: int(r["usage"])
            for r in _viterbi_usage(words, costs, P).collect()
        }
        live = sorted(costs)
        if keep_pieces is not None:
            ranked = sorted(live, key=lambda p: (-usage.get(p, 0), p))
            kept = set(ranked[: int(keep_pieces)])
            kept |= {p for p in live if len(p) == 1}  # feasibility floor
            live = sorted(kept)
        # M-step in Spark expressions (ln/round must match the E-step's
        # engine exactly); add-one smoothing over the LIVE vocabulary
        # (the full seed vocab unless a pruning round shrank it).  The
        # smoothed counts are driver-side ints already, so the exact
        # normalizer rides as a literal (see _norm_costs).
        final_rows = _norm_costs(
            spark,
            sorted((p, usage.get(p, 0) + 1, usage.get(p, 0)) for p in live),
        )
        costs = {r["piece"]: int(r["cost"]) for r in final_rows}
    return costs, final_rows


def unigram_fertility(
    docs: DataFrame,
    max_vocab: int = 400,
    n_pieces: int = 160,
    piece_max_len: int = 4,
    word_max_len: int = 12,
    em_rounds: int = 2,
    seg_word_max_len: int = 16,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Apply the EM-trained unigram tokenizer CORPUS-WIDE: per-source word
    and piece totals plus fertility (pieces per word, ppm) — the standard
    tokenizer-quality readout a pipeline runs before committing to a vocab
    (high fertility on a source = the tokenizer fragments it; compare
    against the BPE twin ``tokenizer_fertility``).

    Segmentation covers every corpus word up to ``seg_word_max_len`` chars
    (longer tail words are out of the report's scope on BOTH engines, so
    the cut is part of the contract, not a silent truncation — the word
    histogram is bounded either way).  Words containing characters outside
    the trained vocabulary segment through the 2^40 infeasible-span cost:
    the (total, j) tie-break keeps even those paths engine-identical.

    Scale shape: two corpus passes (EM's word-frequency groupBy + this
    query's per-source word counts), then everything is vocabulary- or
    word-histogram-bounded; the Viterbi runs once per DISTINCT word in one
    codegen stage and joins back to the (source, word) counts by word."""
    spark = docs.sparkSession
    out_schema = (
        "source string, n_words bigint, n_pieces bigint, fertility_ppm bigint"
    )
    costs, _rows = _unigram_em_costs(
        docs, max_vocab, n_pieces, piece_max_len, word_max_len, em_rounds,
        text_col,
    )
    if not costs:
        return values_relation(spark, [], out_schema)
    cw = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(
                F.split(F.lower(F.col(text_col)), _WORD_SPLIT)
            ).alias("w"),
        )
        .filter((F.col("w") != "") & (F.length("w") <= int(seg_word_max_len)))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    dw = cw.select("w").distinct()
    seg = _with_viterbi(dw, costs, piece_max_len).select(
        "w", F.size("_ps").cast("bigint").alias("np")
    )
    return (
        cw.join(seg, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("np")).cast("bigint").alias("n_pieces"),
        )
        .select(
            "source",
            "n_words",
            "n_pieces",
            F.expr("n_pieces * 1000000 DIV n_words").alias("fertility_ppm"),
        )
        .orderBy("source")
    )


def unigram_lm_em_sql(
    max_vocab: int = 400,
    n_pieces: int = 160,
    piece_max_len: int = 4,
    word_max_len: int = 12,
    em_rounds: int = 2,
    top_out: int = 48,
    keep_pieces: int | None = None,
) -> str:
    """DuckDB oracle for :func:`unigram_lm_em`: the identical integer
    algebra, with the per-word Viterbi DP UNROLLED into one CTE pair per
    position (forward) and per step (backtrace) per EM round — the
    knn_pagerank_sql recipe scaled up.  The tie-break is the same
    (total ASC, j ASC), absent pieces simply don't join (they could
    never beat a feasible path), and the M-step's add-one smoothing
    runs over the full seed vocabulary."""
    R = int(em_rounds)
    return (
        _unigram_em_ctes(
            max_vocab, n_pieces, piece_max_len, word_max_len, R,
            keep_pieces=keep_pieces,
        )
        + f"""
SELECT piece, usage, cost_micro FROM (
    SELECT m.piece, m.usage, c.cost AS cost_micro,
           ROW_NUMBER() OVER (ORDER BY m.usage DESC, m.piece ASC) AS rn
    FROM mu{R} m JOIN cost{R} c ON m.piece = c.piece
) WHERE rn <= {int(top_out)}
ORDER BY usage DESC, piece ASC"""
    )


def _unigram_em_ctes(
    max_vocab: int,
    n_pieces: int,
    piece_max_len: int,
    word_max_len: int,
    em_rounds: int,
    keep_pieces: int | None = None,
    train_where: str = "TRUE",
) -> str:
    """The shared WITH-body of the unigram-EM oracles: seed vocabulary and
    costs, then per round the forward-DP / backtrace / usage / M-step CTE
    chain, ending at ``mu{R}`` / ``cost{R}``.  Every multiply-referenced
    CTE is MATERIALIZED — DuckDB inlines CTEs by default, and the dp chain
    references its predecessor twice, which inlined would expand 2^L
    copies of the base relation."""
    P, L, R = int(piece_max_len), int(word_max_len), int(em_rounds)
    parts = [
        f"""
WITH words AS MATERIALIZED (
    SELECT w, freq FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '{_WORD_SPLIT}')) AS w
            FROM documents WHERE {train_where}
        ) WHERE w <> ''
        GROUP BY w ORDER BY freq DESC, w ASC LIMIT {int(max_vocab)}
    ) WHERE LEN(w) <= {L}
),
pos AS MATERIALIZED (SELECT w, freq, LEN(w) AS n FROM words),
spans AS MATERIALIZED (
    SELECT p.w, p.freq, j.j, j.j + l.l AS i, l.l AS l,
           substring(p.w, j.j + 1, l.l) AS piece
    FROM pos p, range(0, {L}) j(j), range(1, {P + 1}) l(l)
    WHERE j.j + l.l <= p.n
),
cand AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM spans GROUP BY piece),
topv AS (SELECT piece, cnt FROM cand ORDER BY cnt DESC, piece ASC LIMIT {int(n_pieces)}),
vocab0 AS MATERIALIZED (
    SELECT piece, MAX(cnt) AS cnt FROM (
        SELECT * FROM topv
        UNION ALL
        SELECT piece, cnt FROM cand WHERE LEN(piece) = 1
    ) GROUP BY piece
),
tot0 AS (SELECT SUM(cnt) AS tot FROM vocab0),
cost0 AS MATERIALIZED (
    SELECT piece,
           CAST(ROUND((LN(CAST(tot AS DOUBLE)) - LN(CAST(cnt AS DOUBLE)))
                      * 1000000, 0) AS BIGINT) AS cost
    FROM vocab0, tot0
),
vcb0 AS MATERIALIZED (SELECT piece FROM vocab0)"""
    ]
    for r in range(1, R + 1):
        parts.append(
            f""",
sc{r} AS MATERIALIZED (
    SELECT s.w, s.j, s.i, s.l, c.cost
    FROM spans s JOIN cost{r - 1} c ON s.piece = c.piece
),
dp{r}_0 AS MATERIALIZED (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS total FROM words)"""
        )
        for i in range(1, L + 1):
            parts.append(
                f""",
n{r}_{i} AS MATERIALIZED (
    SELECT w, {i} AS i, total, j, l FROM (
        SELECT s.w, d.total + s.cost AS total, s.j, s.l,
               ROW_NUMBER() OVER (PARTITION BY s.w
                                  ORDER BY d.total + s.cost ASC, s.j ASC) AS rn
        FROM sc{r} s JOIN dp{r}_{i - 1} d ON s.w = d.w AND s.j = d.pos
        WHERE s.i = {i}
    ) WHERE rn = 1
),
dp{r}_{i} AS MATERIALIZED (
    SELECT * FROM dp{r}_{i - 1}
    UNION ALL SELECT w, {i} AS pos, total FROM n{r}_{i}
)"""
            )
        bp_union = "\n    UNION ALL ".join(
            f"SELECT w, i, j, l FROM n{r}_{i}" for i in range(1, L + 1)
        )
        parts.append(
            f""",
bp{r} AS MATERIALIZED (
    {bp_union}
),
bt{r}_0 AS MATERIALIZED (SELECT w, freq, n AS pos FROM pos)"""
        )
        for k in range(1, L + 1):
            parts.append(
                f""",
bt{r}_{k} AS MATERIALIZED (
    SELECT b.w, b.freq, bp.j AS pos,
           substring(b.w, bp.j + 1, bp.l) AS piece
    FROM bt{r}_{k - 1} b JOIN bp{r} bp ON b.w = bp.w AND b.pos = bp.i
    WHERE b.pos > 0
)"""
            )
        seg_union = "\n    UNION ALL ".join(
            f"SELECT piece, freq FROM bt{r}_{k}" for k in range(1, L + 1)
        )
        if keep_pieces is not None:
            prune = f""",
kept{r} AS MATERIALIZED (
    SELECT piece FROM (
        SELECT v.piece,
               ROW_NUMBER() OVER (ORDER BY COALESCE(u.usage, 0) DESC,
                                  v.piece ASC) AS rn
        FROM vcb{r - 1} v LEFT JOIN usage{r} u USING (piece)
    ) WHERE rn <= {int(keep_pieces)}
    UNION
    SELECT piece FROM vcb{r - 1} WHERE LEN(piece) = 1
)"""
            live = f"kept{r}"
        else:
            prune = ""
            live = f"vcb{r - 1}"
        parts.append(
            f""",
usage{r} AS MATERIALIZED (
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS usage FROM (
    {seg_union}
    ) GROUP BY piece
){prune},
mu{r} AS MATERIALIZED (
    SELECT v.piece, COALESCE(u.usage, 0) + 1 AS cnt,
           CAST(COALESCE(u.usage, 0) AS BIGINT) AS usage
    FROM {live} v LEFT JOIN usage{r} u USING (piece)
),
vcb{r} AS MATERIALIZED (SELECT piece FROM mu{r}),
mtot{r} AS (SELECT SUM(cnt) AS tot FROM mu{r}),
cost{r} AS MATERIALIZED (
    SELECT piece,
           CAST(ROUND((LN(CAST(tot AS DOUBLE)) - LN(CAST(cnt AS DOUBLE)))
                      * 1000000, 0) AS BIGINT) AS cost
    FROM mu{r}, mtot{r}
)"""
        )
    return "".join(parts)


def unigram_fertility_sql(
    max_vocab: int = 400,
    n_pieces: int = 160,
    piece_max_len: int = 4,
    word_max_len: int = 12,
    em_rounds: int = 2,
    seg_word_max_len: int = 16,
    train_where: str = "TRUE",
    transfer_delta: bool = False,
) -> str:
    """DuckDB oracle for :func:`unigram_fertility`: the shared EM CTEs,
    then corpus-wide segmentation — spans LEFT-join the final costs with
    the same 2^40 infeasible fallback as the Spark map lookup (segmentation
    must cover words whose characters the vocabulary never saw), the same
    unrolled forward DP / backtrace, and a per-source rollup."""
    P, R = int(piece_max_len), int(em_rounds)
    S = int(seg_word_max_len)
    parts = [
        _unigram_em_ctes(
            max_vocab, n_pieces, piece_max_len, word_max_len, R,
            train_where=train_where,
        ),
        f""",
cw AS MATERIALIZED (
    SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT source,
               unnest(regexp_split_to_array(lower(text), '{_WORD_SPLIT}')) AS w
        FROM documents
    ) WHERE w <> '' AND LEN(w) <= {S}
    GROUP BY source, w
),
dw AS MATERIALIZED (SELECT w, LEN(w) AS n FROM (SELECT DISTINCT w FROM cw)),
sspans AS MATERIALIZED (
    SELECT d.w, j.j, j.j + l.l AS i, l.l AS l,
           COALESCE(c.cost, {_VITERBI_BIG}) AS cost
    FROM dw d
    CROSS JOIN range(0, {S}) j(j)
    CROSS JOIN range(1, {P + 1}) l(l)
    LEFT JOIN cost{R} c ON substring(d.w, j.j + 1, l.l) = c.piece
    WHERE j.j + l.l <= d.n
),
sdp_0 AS MATERIALIZED (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS total FROM dw)""",
    ]
    for i in range(1, S + 1):
        parts.append(
            f""",
sn_{i} AS MATERIALIZED (
    SELECT w, {i} AS i, total, j, l FROM (
        SELECT s.w, d.total + s.cost AS total, s.j, s.l,
               ROW_NUMBER() OVER (PARTITION BY s.w
                                  ORDER BY d.total + s.cost ASC, s.j ASC) AS rn
        FROM sspans s JOIN sdp_{i - 1} d ON s.w = d.w AND s.j = d.pos
        WHERE s.i = {i}
    ) WHERE rn = 1
),
sdp_{i} AS MATERIALIZED (
    SELECT * FROM sdp_{i - 1}
    UNION ALL SELECT w, {i} AS pos, total FROM sn_{i}
)"""
        )
    sbp_union = "\n    UNION ALL ".join(
        f"SELECT w, i, j FROM sn_{i}" for i in range(1, S + 1)
    )
    parts.append(
        f""",
sbp AS MATERIALIZED (
    {sbp_union}
),
sbt_0 AS MATERIALIZED (SELECT w, n AS pos FROM dw)"""
    )
    for k in range(1, S + 1):
        parts.append(
            f""",
sbt_{k} AS MATERIALIZED (
    SELECT b.w, bp.j AS pos
    FROM sbt_{k - 1} b JOIN sbp bp ON b.w = bp.w AND b.pos = bp.i
    WHERE b.pos > 0
)"""
        )
    steps_union = "\n    UNION ALL ".join(
        f"SELECT w FROM sbt_{k}" for k in range(1, S + 1)
    )
    parts.append(
        f""",
npieces AS MATERIALIZED (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS np FROM (
    {steps_union}
    ) GROUP BY w
)"""
    )
    if transfer_delta:
        # per-source fertility PLUS its gap to the corpus-wide rate —
        # the transfer readout (vocab trained on ``train_where`` only)
        parts.append(
            """,
roll AS MATERIALIZED (
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * np) AS BIGINT) AS n_pieces
    FROM cw JOIN npieces USING (w)
    GROUP BY source
),
tot AS (SELECT SUM(n_pieces) AS tp, SUM(n_words) AS tw FROM roll)
SELECT source, n_words, n_pieces,
       CAST(CAST(n_pieces AS HUGEINT) * 1000000 // n_words AS BIGINT)
           AS fertility_ppm,
       CAST(CAST(n_pieces AS HUGEINT) * 1000000 // n_words
            - (SELECT tp * 1000000 // tw FROM tot) AS BIGINT)
           AS transfer_delta_ppm
FROM roll
ORDER BY source"""
        )
    else:
        parts.append(
            """
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_words,
       CAST(SUM(cnt * np) AS BIGINT) AS n_pieces,
       CAST(SUM(cnt * np) * 1000000 // SUM(cnt) AS BIGINT) AS fertility_ppm
FROM cw JOIN npieces USING (w)
GROUP BY source
ORDER BY source"""
        )
    return "".join(parts)


def unigram_transfer_fertility(
    docs: DataFrame,
    train_where: str = "source <= 'src0'",
    max_vocab: int = 400,
    n_pieces: int = 160,
    piece_max_len: int = 4,
    word_max_len: int = 12,
    em_rounds: int = 2,
    seg_word_max_len: int = 16,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """TOKENIZER TRANSFER readout: train the unigram-LM vocabulary on
    the ``train_where`` slice ONLY (one source, one language, a
    sample), apply it CORPUS-WIDE, and report each source's fertility
    plus its gap to the corpus-wide rate — the quantitative answer to
    "whose text does this vocabulary fragment?", i.e. the vocabulary-
    coverage question a multilingual/multi-domain pipeline must settle
    before committing to a tokenizer (Kudo 2018's fertility metric,
    cross-slice).  transfer_delta_ppm > 0 marks sources the trained
    slice under-serves.

    Contract: ``train_where`` must select a slice that yields a
    non-empty vocabulary on real corpora; when the whole corpus is
    degenerate (empty / NULL / empty-string texts) both engines return
    zero rows.  Scale shape identical to :func:`unigram_fertility`
    (training is vocab-bounded, segmentation runs once per distinct
    word, the rollup is per-source); the delta is one broadcast
    1-row cross join."""
    spark = docs.sparkSession
    out_schema = (
        "source string, n_words bigint, n_pieces bigint, "
        "fertility_ppm bigint, transfer_delta_ppm bigint"
    )
    costs, _rows = _unigram_em_costs(
        docs.filter(F.expr(train_where)), max_vocab, n_pieces,
        piece_max_len, word_max_len, em_rounds, text_col,
    )
    if not costs:
        return values_relation(spark, [], out_schema)
    cw = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(
                F.split(F.lower(F.col(text_col)), _WORD_SPLIT)
            ).alias("w"),
        )
        .filter((F.col("w") != "") & (F.length("w") <= int(seg_word_max_len)))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    dw = cw.select("w").distinct()
    seg = _with_viterbi(dw, costs, piece_max_len).select(
        "w", F.size("_ps").cast("bigint").alias("np")
    )
    roll = (
        cw.join(seg, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("np")).cast("bigint").alias("n_pieces"),
        )
        .localCheckpoint(eager=True)  # feeds the rollup AND the total
    )
    tot = roll.agg(
        F.sum(F.col("n_pieces").cast("decimal(38,0)")).alias("tp"),
        F.sum(F.col("n_words").cast("decimal(38,0)")).alias("tw"),
    )
    return (
        roll.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_words",
            "n_pieces",
            F.expr(
                "CAST(CAST(n_pieces AS DECIMAL(38,0)) * 1000000 "
                "DIV n_words AS BIGINT)"
            ).alias("fertility_ppm"),
            F.expr(
                "CAST(CAST(n_pieces AS DECIMAL(38,0)) * 1000000 DIV n_words "
                "- tp * 1000000 DIV tw AS BIGINT)"
            ).alias("transfer_delta_ppm"),
        )
        .orderBy("source")
    )
