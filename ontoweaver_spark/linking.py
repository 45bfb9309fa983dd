"""Entity linking + canonicalization for web-scale KG construction.

The reference expresses canonicalization implicitly: its mappings chain
``lower`` / ``replace`` / ``translate`` transformers to normalize entity
names before fusion merges equal IDs (e.g. the oncokb mapping's cleanup of
gene symbols, /root/reference/tests/oncokb/mapping.yaml; ``translate`` as
the alias table, /root/reference/src/ontoweaver/transformer.py:697-910).
This module makes those steps first-class, Spark-native operators so the
north-rule pipeline (triple extraction -> **entity linking ->
canonicalization** -> graph materialize) has explicit, scale-shaped stages:

- **URL canonicalization**: pure Column expressions (codegen-friendly, no
  shuffle) — the per-URL identity key at 10^12-document scale.
- **Entity-name canonicalization**: lowercase + punctuation strip +
  whitespace collapse, the composition of the reference's `lower` and
  `replace` transformers.
- **Alias-table linking**: mention -> canonical entity id via a
  ``broadcast`` hash join (the alias dictionary is the small side; the
  mention stream never shuffles). Unknown mentions either keep their
  canonical-name identity or are dropped, mirroring `translate`'s
  ``on_unknown_value`` policies.
- **Cross-document co-mention edges**: the one genuinely shuffling step,
  keyed on the canonical entity id (salt-aware for hub entities).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .session import stats_reset_checkpoint

# --------------------------------------------------------------------------
# canonicalization (no shuffle: pure Column expressions)
# --------------------------------------------------------------------------

def canonical_url(c: Column) -> Column:
    """Canonicalize a URL to its dedup identity:

    - lowercase scheme + host; strip a leading ``www.``
    - drop the fragment (``#...``) and the query string (``?...``)
    - strip default ports (``:80`` http, ``:443`` https)
    - strip a single trailing slash (but keep the bare-root ``/``)

    All regexp/lower ops stay inside whole-stage codegen.

    This is the AGGRESSIVE entity-identity key (the whole query string is
    document-irrelevant when a URL names an entity). For crawl-snapshot
    keys where ``?page=2`` is a different document, use
    ``urls.canonical_url`` — it keeps non-tracking query params.
    """
    # split scheme://host/rest ; lowercase scheme+host only
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(host)
    host = F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)

    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    path = F.when(F.length(path) > 1, F.regexp_replace(path, r"/+$", "")).otherwise(path)

    return F.when(scheme == "", c).otherwise(F.concat(scheme, F.lit("://"), host, path))


def canonical_entity(c: Column) -> Column:
    """Canonical entity-name key: lowercase, strip non-alphanumerics to
    spaces, collapse runs of whitespace, trim. The Column composition of the
    reference's `lower` + `replace` transformers
    (/root/reference/src/ontoweaver/transformer.py:631-650, 984-1055)."""
    x = F.lower(c)
    x = F.regexp_replace(x, r"[^a-z0-9]+", " ")
    return F.regexp_replace(F.regexp_replace(x, r"\s+", " "), r"^\s+|\s+$", "")


# --------------------------------------------------------------------------
# alias-table entity linking (broadcast join)
# --------------------------------------------------------------------------

def link_entities(
    mentions: DataFrame,
    aliases: DataFrame,
    mention_col: str = "mention",
    alias_col: str = "alias",
    canonical_col: str = "canonical",
    on_unknown: str = "keep",
) -> DataFrame:
    """Resolve mention strings to canonical entity ids.

    ``aliases`` is the small dimension (alias -> canonical id); it is
    broadcast so the mention side — the 100 TB side — never shuffles.
    Matching happens on the canonicalized form of both sides, so
    "Apple Inc." links to the alias "apple inc".

    ``on_unknown``: ``keep`` -> unlinked mentions fall back to their
    canonical-name key (entity identity = normalized surface form);
    ``skip`` -> unlinked mentions are dropped (translate's default policy,
    /root/reference/src/ontoweaver/transformer.py:788).

    Output: ``mentions`` columns + ``entity_id`` + ``linked`` (bool).
    """
    if on_unknown not in ("keep", "skip"):
        raise ValueError(f"on_unknown must be keep|skip, got {on_unknown!r}")
    key = canonical_entity(F.col(mention_col))
    dim = aliases.select(
        canonical_entity(F.col(alias_col)).alias("_ow_alias_key"),
        F.col(canonical_col).alias("_ow_canonical"),
    ).dropDuplicates(["_ow_alias_key"])
    out = (
        mentions.withColumn("_ow_alias_key", key)
        .join(F.broadcast(dim), "_ow_alias_key", "left")
        .withColumn("linked", F.col("_ow_canonical").isNotNull())
        .withColumn("entity_id", F.coalesce(F.col("_ow_canonical"), F.col("_ow_alias_key")))
        .drop("_ow_alias_key", "_ow_canonical")
    )
    if on_unknown == "skip":
        out = out.where(F.col("linked"))
    return out


def comention_edges(
    doc_entities: DataFrame,
    doc_col: str = "doc_id",
    entity_col: str = "entity_id",
    min_count: int = 1,
) -> DataFrame:
    """(entity_a, entity_b, n_docs) co-mention edges from per-document
    entity sets. Shuffle shape: one groupBy(doc) to build per-doc distinct
    entity arrays (bounded by per-doc entity count, not corpus size), then
    an explode of the per-doc pair list and one counting aggregate keyed on
    the pair — no self-join of the full mention table."""
    per_doc = doc_entities.groupBy(doc_col).agg(
        F.array_sort(F.array_distinct(F.collect_list(entity_col))).alias("es")
    )
    pairs = per_doc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("es"),
                    lambda a, i: F.transform(
                        F.slice(F.col("es"), i + 2, F.greatest(F.size("es") - i - 1, F.lit(0))),
                        lambda b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    out = pairs.groupBy("a", "b").agg(F.count("*").alias("n_docs"))
    return out.where(F.col("n_docs") >= min_count) if min_count > 1 else out


def resolve_claims(
    claims: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    weight_col: str | None = None,
) -> DataFrame:
    """Majority-vote truth finding over conflicting extracted triples —
    the canonicalization step AFTER linking: many pages assert
    ``(subj, pred, ·)`` with different objects (stale recrawls, spam,
    extraction noise), and the KG should materialize one winning object
    per functional predicate. The winner is the object with the highest
    support (sum of ``weight_col``, or vote count when None); ties break
    on the lexicographically smallest object so the result is
    deterministic — Spark's ``max_by`` alone is not, which is why the
    pick is a struct-max: ``max(struct(support, neg_rank(obj)))`` can't
    express string descent, so a two-level aggregate is used instead.

    Returns ``(subj, pred, obj, support, total_support, n_objects,
    confidence)`` with ``confidence = support/total_support`` IEEE-rounded
    to 4 digits. ``weight_col`` keeps its own numeric type (an int column
    sums to BIGINT, a double column to DOUBLE — never silently truncated);
    note that FRACTIONAL weights make ``support`` an FP sum, whose last
    ulp can depend on partitioning/engine — use integer-scaled weights
    (e.g. confidence*1000 as int) where bit-exact reproducibility matters.

    100-TB shape: two hash aggregates on progressively coarser keys —
    (s,p,o) then (s,p) — both with map-side partial combine, so a hub
    subject asserted by 10^9 pages collapses per map partition before
    either exchange; the second agg is co-located with the first
    (HashPartitioning(s,p,o) does NOT satisfy clustering on (s,p), so
    this one re-shuffles — necessary, and it moves one row per distinct
    (s,p,o), not one per claim). No windows, no sort.
    """
    from .textops import round_ieee

    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    per_obj = claims.groupBy(subj_col, pred_col, obj_col).agg(
        F.sum(w).alias("support")
    )
    # min(struct(-support, obj)) picks max support, then min obj — one agg,
    # deterministic
    resolved = per_obj.groupBy(subj_col, pred_col).agg(
        F.min(
            F.struct(
                F.negate(F.col("support")).alias("_ns"),
                F.col(obj_col).alias("_o"),
            )
        ).alias("_w"),
        F.sum("support").alias("total_support"),
        F.count("*").alias("n_objects"),
    )
    return resolved.select(
        subj_col,
        pred_col,
        F.col("_w")["_o"].alias(obj_col),
        F.negate(F.col("_w")["_ns"]).alias("support"),
        "total_support",
        "n_objects",
    ).select(
        "*",
        round_ieee(F.col("support") / F.col("total_support"), 4).alias("confidence"),
    )


def er_candidates(
    entities: DataFrame,
    name_col: str = "name",
    id_col: str = "entity_id",
    window: int = 3,
    max_distance: int = 2,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking + edit-distance
    verification -> ``(a, b, name_a, name_b, distance)``: the fuzzy-match
    stage BETWEEN exact canonicalization (:func:`canonical_entity`) and
    human review — typo'd variants ("acme corp" / "acme crop") block
    together because they sort together, then ``levenshtein`` confirms.

    Sorted-neighborhood is the classic alternative to LSH blocking for
    SHORT strings (names), where shingle minhash is noise: sort all
    canonical names once, compare each row only to the ``window`` rows
    after it, verify the O(n * window) candidate pairs exactly.

    Pairs are emitted with ``a`` = the sort-earlier entity id; both
    directions of a match appear once. Entities whose canonical names are
    EQUAL are each other's duplicates already (distance 0) and still pair
    here (rank neighbors), so the output subsumes exact-name matching
    inside the window.

    Scale shape: ONE range-partitioned distributed sort (never a
    single-task window — the rank is the lazy zip-with-index of
    training_order), then a bucketed self-join on ``rank // window``
    (each row joins its own and the next bucket only — 2 probes per row,
    |pairs| <= n * window before the distance filter). ``levenshtein``
    is JVM whole-stage-codegen; nothing collects.
    """
    from .compiler import with_row_index

    canon = entities.select(
        F.col(id_col), canonical_entity(F.col(name_col)).alias("_cn")
    )
    ordered = canon.orderBy("_cn", id_col).localCheckpoint(eager=False)
    ranked = with_row_index(ordered, "_rk").localCheckpoint(eager=False)

    left = ranked.select(
        F.col(id_col).alias("a"), F.col("_cn").alias("name_a"),
        F.col("_rk").alias("_ra"), (F.col("_rk") / window).cast("long").alias("_bk"),
    )
    probe = ranked.select(
        F.col(id_col).alias("b"), F.col("_cn").alias("name_b"),
        F.col("_rk").alias("_rb"),
        F.explode(
            F.array(
                (F.col("_rk") / window).cast("long"),
                (F.col("_rk") / window).cast("long") - 1,
            )
        ).alias("_bk"),
    )
    return (
        left.join(probe, "_bk")
        .where(
            (F.col("_rb") > F.col("_ra")) & (F.col("_rb") - F.col("_ra") <= window)
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .where(F.col("distance") <= max_distance)
        .select("a", "b", "name_a", "name_b", "distance")
    )


def infer_types(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    type_col: str = "type",
) -> DataFrame:
    """Seeded neighbor-vote entity typing -> ``(node, type, round)``.

    The KG-construction step after extraction leaves many nodes untyped
    (the reference types nodes only when a mapping names a type;
    everything else falls out of `match_type_from_column` or stays
    generic — /root/reference/src/ontoweaver/tabular.py's subject/object
    type plumbing). This operator propagates types from the ``seeds``
    table over the undirected edge graph for a FIXED number of rounds:
    each round, every still-untyped node with >=1 typed neighbor takes
    the majority type among its typed neighbors (distinct neighbors, so
    parallel edges don't multi-vote), ties broken to the
    lexicographically smallest type. Seeds are frozen (round 0) and never
    reassigned; a node typed in round r votes from round r+1 on.

    Fixed rounds (not convergence-polling) keeps the operator a static
    DAG — resumable, plannable, and oracle-expressible as unrolled CTEs.

    Shape at 10^12 edges: per round, one distinct + one join of the
    adjacency against the (much smaller) typed frontier, and one hash
    aggregate for the vote — the typed set is joined on the neighbor key,
    so AQE can broadcast it while it is small and shuffle it once it
    grows. `localCheckpoint` per round truncates the lineage exactly like
    the dedup connected-components loop.
    """
    adj = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    typed = seeds.select(
        F.col(node_col).alias("node"),
        F.col(type_col).alias("type"),
        F.lit(0).alias("round"),
    ).localCheckpoint(eager=False)
    for r in range(1, rounds + 1):
        votes = (
            adj.join(typed.withColumnRenamed("node", "b"), "b")
            .join(typed.select(F.col("node").alias("a")), "a", "left_anti")
            .groupBy(F.col("a").alias("node"), "type")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        newly = (
            votes.groupBy("node")
            .agg(
                F.min(F.struct((-F.col("_c")).alias("_neg"), F.col("type"))).alias("_w")
            )
            .select("node", F.col("_w.type").alias("type"), F.lit(r).alias("round"))
        )
        typed = typed.unionByName(newly).transform(lambda _d: stats_reset_checkpoint(_d, eager=False))
    return typed


# --------------------------------------------------------------------------
# token blocking + meta-blocking (schema-agnostic ER candidate generation)
# --------------------------------------------------------------------------

def token_blocking_candidates(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_block_size: int = 100,
    top_k: int = 5,
) -> DataFrame:
    """Schema-agnostic ER blocking -> candidate pairs ``(id_a, id_b,
    common_blocks)``: records sharing a canonicalized name token land in
    the same block; pairs are weighted by how many blocks they co-occur
    in (the CBS weighting of Papadakis' meta-blocking) and pruned to each
    record's ``top_k`` strongest partners (cardinality-node-pruning).

    Complements :func:`er_candidates` (sorted-neighborhood): token
    blocking catches word-reordered names ("John Smith" / "Smith, John")
    that a lexicographic sort separates, at the cost of a block-size
    guard instead of a fixed window.

    Block purging: tokens appearing in more than ``max_block_size``
    records are dropped BEFORE the self-join — the standard stop-word
    block cut that bounds the blow-up at ``sum(df^2)`` over surviving
    tokens (<= n * max_block_size). At web scale that single knob is the
    difference between a linear pass and a Zipf-hot-token quadratic.

    Pruning runs on BOTH pair orientations (a<b canonical order, but the
    rank window is evaluated per endpoint via a symmetric union), so a
    pair survives if EITHER endpoint ranks it top-k — Papadakis'
    "redefined" CNP. Ties break on the partner id (deterministic,
    engine-portable). Output is the canonical ``id_a < id_b`` pair set.
    """
    toks = records.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(
                F.split(canonical_entity(F.col(name_col)), " ")
            )
        ).alias("_tok"),
    ).where(F.col("_tok") != "")

    small = (
        toks.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_block_size)
        .select("_tok")
    )
    # pin the surviving token list: the pair self-join below references it
    # twice and would otherwise tokenize + purge the corpus once per side
    toks = stats_reset_checkpoint(
        toks.join(F.broadcast(small), "_tok"), eager=False
    )

    pairs = (
        toks.alias("a")
        .join(toks.alias("b"), "_tok")
        .where(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common_blocks"))
    )
    # pin: the symmetric CNP union below references the pair frame once
    # per endpoint — unpinned, the block self-join (the expensive part)
    # would execute twice (seen in the physical plan as two SortMergeJoin
    # subtrees; plan-asserted in test_plan_shapes_r4)
    pairs = stats_reset_checkpoint(pairs, eager=False)

    sym = pairs.select(
        F.col("id_a").alias("ep"), "id_a", "id_b", "common_blocks"
    ).unionByName(
        pairs.select(F.col("id_b").alias("ep"), "id_a", "id_b", "common_blocks")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ep").orderBy(
        F.col("common_blocks").desc(), "id_a", "id_b"
    )
    kept = (
        sym.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .select("id_a", "id_b", "common_blocks")
        .distinct()
    )
    return kept


# --------------------------------------------------------------------------
# commonness prior (anchor-text statistics) + argmax disambiguation
# --------------------------------------------------------------------------

def entity_prior(
    anchors: DataFrame,
    mention_col: str = "mention",
    entity_col: str = "entity_id",
) -> DataFrame:
    """Commonness prior p(entity | mention) from observed anchor/link
    statistics -> ``(mention, entity_id, n_links, prior_ppm)`` — the
    classic entity-linking prior (Milne & Witten, CIKM'08): across a web
    corpus, how often does the surface form "apple" link to the fruit
    vs. the company?  This is the single strongest EL feature and the
    disambiguation backbone the alias-table `link_entities` lacks when a
    mention maps to SEVERAL canonical ids.

    Exact integer arithmetic: ``prior_ppm = n_links * 1_000_000 div
    total_links(mention)`` (BIGINT truncating division) so the result
    hash-matches any engine — no float surface.

    Shape at 10^12 pages: one counting aggregate keyed on (mention,
    entity) — map-side combined, so the shuffle carries one row per
    DISTINCT pair, not per link — then one window re-keyed on mention
    for the per-mention total.  Per-mention row count is bounded by the
    entity vocabulary observed for that surface form (tens, not
    millions), so the window partition never skews.  The reference has
    no counterpart (its `translate` alias table is 1:1 by construction,
    /root/reference/src/ontoweaver/transformer.py:697-910); this is the
    many:many generalization a web-scale anchor corpus forces.
    """
    from pyspark.sql import Window

    counts = (
        anchors.select(
            F.col(mention_col).cast("string").alias("mention"),
            F.col(entity_col).cast("string").alias("entity_id"),
        )
        .groupBy("mention", "entity_id")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    w = Window.partitionBy("mention")
    return counts.select(
        "mention",
        "entity_id",
        "n_links",
        F.expr("n_links * 1000000").cast("long").alias("_scaled"),
        F.sum("n_links").over(w).alias("_total"),
    ).select(
        "mention",
        "entity_id",
        "n_links",
        F.expr("_scaled div _total").cast("long").alias("prior_ppm"),
    )


def disambiguate_by_prior(
    mentions: DataFrame,
    prior: DataFrame,
    mention_col: str = "mention",
) -> DataFrame:
    """Resolve each mention occurrence to its most-common entity ->
    ``mentions`` columns + ``(entity_id, prior_ppm)`` — the argmax-prior
    baseline disambiguator (the standard EL baseline; ~all production
    linkers fall back to it when context features are absent).

    Deterministic argmax: highest ``prior_ppm``, then highest raw
    ``n_links`` (ppm ties can hide different counts through truncating
    division), then lexicographically smallest ``entity_id`` — encoded
    as one ``min_by`` over a struct ordering, a single map-side-combined
    aggregate per mention, never a row_number window over the full
    occurrence stream.

    Shape: the prior table collapses to ONE row per distinct mention
    before touching the occurrence stream; the final join keys on the
    mention dictionary (vocabulary-sized, broadcastable when small) so
    the 100 TB occurrence side shuffles zero times when the dictionary
    broadcasts.
    """
    top1 = (
        prior.groupBy("mention")
        .agg(
            F.expr(
                "min_by(named_struct('entity_id', entity_id,"
                " 'prior_ppm', prior_ppm),"
                " named_struct('a', -prior_ppm, 'b', -n_links, 'c', entity_id))"
            ).alias("_pick")
        )
        .select(
            "mention",
            F.col("_pick.entity_id").alias("entity_id"),
            F.col("_pick.prior_ppm").alias("prior_ppm"),
        )
    )
    return mentions.withColumn(
        "_ow_m", F.col(mention_col).cast("string")
    ).join(
        F.broadcast(top1.withColumnRenamed("mention", "_ow_m")), "_ow_m", "left"
    ).drop("_ow_m")


# --------------------------------------------------------------------------
# iterative source-reliability truth finding (Sums / hubs-authorities family)
# --------------------------------------------------------------------------

def truth_finder(
    claims: DataFrame,
    source_col: str = "source",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    rounds: int = 2,
) -> DataFrame:
    """Iterative source-reliability truth finding -> per distinct claim
    ``(subj, pred, obj, n_sources, belief, conf_ppm)`` — the fusion step
    BEYOND `resolve_claims`' majority vote: source trust and claim
    confidence reinforce each other (Sums, the hubs-authorities member
    of the Pasternack-Roth COLING'10 fact-finder family; the same
    bipartite recurrence behind TruthFinder/Knowledge-Vault-style
    weighting).  A value asserted by three consistently-corroborated
    sources beats one asserted by four sources that disagree with
    everyone elsewhere — majority vote cannot tell them apart.

    Exact integer arithmetic end to end (the repo's engine-portable
    discipline): trust starts at 1,000,000 ppm per source; per round,
    claim ``belief = sum(trust of asserting sources)`` (BIGINT),
    ``conf_ppm = belief * 1_000_000 div sum(belief over competing
    values of the same (subj, pred))``, and trust updates to the mean
    confidence of the source's claims (truncating BIGINT div).  No
    floats, no damping constants hidden in doubles.

    Shape at 10^12 claims: assertions deduplicate once (map-side
    combine); each round is (a) a join keyed on source, (b) a hash agg
    to (s,p,o), (c) a co-keyed rollup to (s,p) joined back, (d) a hash
    agg back to source — all partial-aggregated, no windows, no
    driver collection; ``rounds`` is a small constant (2-3 suffices in
    the published evaluations).  Trust frames pass through
    ``stats_reset_checkpoint`` so Catalyst stats don't compound across
    rounds (the repo-documented iterative-loop hazard).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    a = (
        claims.select(
            F.col(source_col).cast("string").alias("source"),
            F.col(subj_col).cast("string").alias("subj"),
            F.col(pred_col).cast("string").alias("pred"),
            F.col(obj_col).cast("string").alias("obj"),
        )
        .distinct()
        .transform(lambda d: stats_reset_checkpoint(d, eager=False))
    )
    trust = a.select("source").distinct().withColumn(
        "trust", F.lit(1_000_000).cast("long")
    )
    conf = None
    for _ in range(rounds):
        belief = (
            a.join(trust, "source")
            .groupBy("subj", "pred", "obj")
            .agg(
                F.sum("trust").alias("belief"),
                F.count(F.lit(1)).alias("n_sources"),
            )
        )
        total = belief.groupBy("subj", "pred").agg(
            F.sum("belief").alias("_total")
        )
        conf = belief.join(total, ["subj", "pred"]).select(
            "subj",
            "pred",
            "obj",
            "n_sources",
            "belief",
            F.expr("belief * 1000000 div _total").cast("long").alias("conf_ppm"),
        )
        trust = (
            a.join(conf.select("subj", "pred", "obj", "conf_ppm"),
                   ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(
                F.expr("sum(conf_ppm) div count(1)")
                .cast("long")
                .alias("trust")
            )
            .transform(lambda d: stats_reset_checkpoint(d, eager=False))
        )
    return conf


def disambiguate_by_context(
    occurrences: DataFrame,
    prior: DataFrame,
    profiles: DataFrame,
    occ_id_col: str = "occ_id",
    mention_col: str = "mention",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Context-compatibility entity disambiguation -> one row per
    occurrence ``(occ_id, mention, entity_id, ctx_score, prior_ppm)`` —
    the second stage of the classic two-signal linker (prior +
    context): among the candidate entities the `entity_prior` table
    admits for a mention, pick the one whose token profile overlaps the
    occurrence's OWN context most (exact BIGINT overlap weight); fall
    back to the prior argmax when no candidate profile token matches.

    ``occurrences``: (occ_id, mention, tokens array<string>).
    ``profiles``: (entity_id, token, weight BIGINT) — e.g. document
    frequencies of tokens in pages known to refer to the entity.

    Deterministic pick per occurrence: highest ``ctx_score``, then
    highest ``prior_ppm``, then smallest ``entity_id`` — one
    min_by-over-struct aggregate keyed on occ_id.

    Shape at 10^12 occurrences: candidate profile tokens materialize
    once as ``prior JOIN profiles`` keyed on entity_id (dictionary x
    profile-width — vocabulary-scale, NOT corpus-scale); the occurrence
    side explodes its context tokens and joins on (mention, token) —
    both hash joins on bounded-cardinality dictionary keys; the final
    argmax is map-side combinable. Occurrences whose mention has no
    candidates at all come back with null entity (left joins end to
    end), mirroring `disambiguate_by_prior`'s unlinked convention.
    """
    occ = occurrences.select(
        F.col(occ_id_col).cast("string").alias("occ_id"),
        F.col(mention_col).cast("string").alias("mention"),
        F.col(tokens_col).alias("_toks"),
    )
    cand_tokens = (
        prior.select("mention", "entity_id", "prior_ppm")
        .join(
            profiles.select(
                F.col("entity_id"),
                F.col("token").cast("string").alias("token"),
                F.col("weight").cast("long").alias("weight"),
            ),
            "entity_id",
        )
    )
    occ_tokens = occ.select(
        "occ_id", "mention", F.explode_outer(F.array_distinct("_toks")).alias("token")
    )
    scored = (
        occ_tokens.join(cand_tokens, ["mention", "token"])
        .groupBy("occ_id", "mention", "entity_id", "prior_ppm")
        .agg(F.sum("weight").alias("ctx_score"))
    )
    picked = scored.groupBy("occ_id").agg(
        F.expr(
            "min_by(named_struct('entity_id', entity_id,"
            " 'ctx_score', ctx_score, 'prior_ppm', prior_ppm),"
            " named_struct('a', -ctx_score, 'b', -prior_ppm, 'c', entity_id))"
        ).alias("_pick")
    )
    # occurrences with zero profile-token overlap fall back to the prior
    # argmax for their mention; mentions absent from the prior stay null
    fallback = (
        prior.groupBy("mention")
        .agg(
            F.expr(
                "min_by(named_struct('entity_id', entity_id,"
                " 'prior_ppm', prior_ppm),"
                " named_struct('a', -prior_ppm, 'b', -n_links, 'c', entity_id))"
            ).alias("_fb")
        )
    )
    return (
        occ.select("occ_id", "mention")
        .join(picked, "occ_id", "left")
        .join(fallback, "mention", "left")
        .select(
            "occ_id",
            "mention",
            F.coalesce(F.col("_pick.entity_id"), F.col("_fb.entity_id")).alias(
                "entity_id"
            ),
            F.coalesce(F.col("_pick.ctx_score"), F.lit(0)).cast("long").alias(
                "ctx_score"
            ),
            F.coalesce(F.col("_pick.prior_ppm"), F.col("_fb.prior_ppm")).alias(
                "prior_ppm"
            ),
        )
    )


def spot_mentions(
    docs: DataFrame,
    gazetteer: DataFrame,
    max_len: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    surface_col: str = "surface",
    entity_col: str = "entity_id",
    maximal_only: bool = True,
) -> DataFrame:
    """Dictionary mention spotting -> ``(doc_id, pos, n_tokens, surface,
    entity_id)``: find every occurrence of a gazetteer surface form
    (multi-word allowed, up to ``max_len`` tokens) inside raw document
    text — the step BEFORE :func:`link_entities`/:func:`entity_prior`:
    those resolve already-extracted mentions; this extracts them. The
    distributed stand-in for an Aho-Corasick pass: candidate n-grams
    come straight off each document's token array (no joins to build
    them), and only the broadcast-sized dictionary join touches a
    shuffle boundary.

    Matching is on lowercase whitespace-normalized tokens (punctuation
    split off, same normalization applied to the gazetteer side).
    Overlap policy: MAXIMAL matches only — a match strictly contained
    inside another match of the same document is dropped ("york" never
    fires inside "new york city"), via one per-doc containment
    anti-join over the (bounded, dictionary-hit-sized) match set.
    Partial overlaps that contain each other's boundaries both survive
    (deterministic, order-free — no sequential leftmost scan).

    Scale shape: per-doc n-gram generation is ``max_len`` array
    ``transform``s + one explode (document-length-bounded, zero
    shuffle); the dictionary join broadcasts the gazetteer; the
    containment anti-join is keyed by doc_id over only the HITS, not
    the n-grams.
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]+", " ")),
        r"\s+",
    )
    grams = None
    # one tokenize pass shared by all max_len gram legs (the union
    # duplicates its child subtree in-plan — without the checkpoint the
    # regex tokenization runs once per leg)
    from .session import stats_reset_checkpoint

    base = stats_reset_checkpoint(
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t")),
        eager=False,
    )
    for n in range(1, max_len + 1):
        g = base.select(
            "doc_id",
            F.explode(
                F.transform(
                    # sequence(1, 0) counts DOWN in Spark — guard short docs
                    F.when(
                        F.size("_t") >= n,
                        F.sequence(F.lit(1), F.size("_t") - F.lit(n - 1)),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(
                            " ", F.slice(F.col("_t"), i, F.lit(n))
                        ).alias("surface"),
                    ),
                )
            ).alias("_g"),
        ).select(
            "doc_id",
            F.col("_g.pos").alias("pos"),
            F.lit(n).alias("n_tokens"),
            F.col("_g.surface").alias("surface"),
        )
        grams = g if grams is None else grams.unionByName(g)
    dim = gazetteer.select(
        F.trim(
            F.regexp_replace(
                F.lower(F.col(surface_col).cast("string")), r"\s+", " "
            )
        ).alias("surface"),
        F.col(entity_col).cast("string").alias("entity_id"),
    ).dropDuplicates(["surface"])
    hits = grams.join(F.broadcast(dim), "surface").select(
        "doc_id", "pos", "n_tokens", "surface", "entity_id"
    )
    if not maximal_only:
        # every dictionary hit, contained spans included (the input a
        # trained span-ranker would want); single broadcast join, no
        # checkpoint, no self-join
        return hits
    hits = hits.localCheckpoint(eager=False)
    other = hits.select(
        F.col("doc_id").alias("_d2"),
        F.col("pos").alias("_p2"),
        F.col("n_tokens").alias("_n2"),
    )
    return hits.join(
        other,
        (F.col("doc_id") == F.col("_d2"))
        & (F.col("_p2") <= F.col("pos"))
        & (F.col("_p2") + F.col("_n2") >= F.col("pos") + F.col("n_tokens"))
        & (F.col("_n2") > F.col("n_tokens")),
        "left_anti",
    )


# Vendored 1:1 diacritic fold table (U+00C0-U+024F), generated from and
# bit-identical to DuckDB 1.0 ``strip_accents`` on every covered char
# (tests/test_er_metrics.py re-derives it against the installed duckdb).
# Ligatures and non-decomposable letters in the range (AE, ss, Dj, Th, OE,
# ...) are deliberately NOT folded -- strip_accents keeps them too, so the
# two engines agree by construction.
_FOLD_SRC = 'ÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝàáâãäåçèéêëìíîïñòóôõöùúûüýÿĀāĂăĄąĆćĈĉĊċČčĎďĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĨĩĪīĬĭĮįİĴĵĶķĹĺĻļĽľŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŠšŢţŤťŨũŪūŬŭŮůŰűŲųŴŵŶŷŸŹźŻżŽžƠơƯưǍǎǏǐǑǒǓǔǕǖǗǘǙǚǛǜǞǟǠǡǦǧǨǩǪǫǬǭǰǴǵǸǹǺǻȀȁȂȃȄȅȆȇȈȉȊȋȌȍȎȏȐȑȒȓȔȕȖȗȘșȚțȞȟȦȧȨȩȪȫȬȭȮȯȰȱȲȳ'
_FOLD_DST = 'AAAAAACEEEEIIIINOOOOOUUUUYaaaaaaceeeeiiiinooooouuuuyyAaAaAaCcCcCcCcDdEeEeEeEeEeGgGgGgGgHhIiIiIiIiIJjKkLlLlLlNnNnNnOoOoOoRrRrRrSsSsSsSsTtTtUuUuUuUuUuUuWwYyYZzZzZzOoUuAaIiOoUuUuUuUuUuAaAaGgKkOoOojGgNnAaAaAaEeEeIiIiOoOoRrRrUuUuSsTtHhAaEeOoOoOoOoYy'


def fold_diacritics(col):
    """Accent-fold a string Column for ER blocking keys: ``Renée`` ->
    ``Renee``, ``Černý`` -> ``Cerny``. Entity names arrive from the crawl
    in mixed normalization; exact-match blocking on the raw surface form
    splits what is one entity. This is the cheap, exact, engine-portable
    4/5ths of Unicode normalization: a single in-codegen ``translate``
    (no UDF, no shuffle, no Python), covering every 1:1 Latin diacritic
    decomposition in U+00C0-U+024F exactly as DuckDB's
    ``strip_accents`` folds them. Full NFKD (ligature expansion,
    non-Latin scripts) is a documented non-goal -- it is not 1:1, so it
    cannot be a translate; route those corpora through a Pandas-UDF
    normalizer instead and lose the SQL-oracle property.
    """
    return F.translate(col if isinstance(col, Column) else F.col(col),
                       _FOLD_SRC, _FOLD_DST)


def blocking_metrics(
    candidates: DataFrame,
    gold: DataFrame,
    n_records: int,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Blocking-quality rollup for an ER candidate generator -> ONE row
    ``(n_candidates, n_gold, n_matched, total_pairs, reduction_ratio_ppm,
    pair_completeness_ppm, pair_quality_ppm)`` — the standard blocking
    evaluation triple (Christen, TKDE'12): reduction ratio = how much of
    the quadratic pair space the blocker pruned; pair completeness =
    recall of true matches among candidates; pair quality = precision.
    Every blocker in this engine (token blocking, sorted neighborhood,
    minhash bands, IFP joins) trades these off — this is the measurement
    that says which to ship at which threshold, BEFORE paying for the
    expensive match step.

    Pairs are canonicalized (least, greatest) on both sides so direction
    never miscounts. All ratios are exact integer ppm (x * 1e6 DIV y,
    NULL when the denominator is 0); ``total_pairs = n(n-1)/2`` comes
    from the caller-supplied record count, since the candidate frame no
    longer knows the universe it was drawn from. Shape: two distincts +
    one broadcast-sized inner join on the (usually tiny) gold set, then
    single-row aggregates crossed together — output is one row.
    """
    def canon(df):
        a, b = F.col(a_col).cast("string"), F.col(b_col).cast("string")
        return df.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        ).where(F.col("a") != F.col("b")).distinct()

    cand, g = canon(candidates), canon(gold)
    total = n_records * (n_records - 1) // 2
    nc = cand.agg(F.count("*").alias("n_candidates"))
    ng = g.agg(F.count("*").alias("n_gold"))
    nm = cand.join(F.broadcast(g), ["a", "b"]).agg(
        F.count("*").alias("n_matched")
    )
    row = nc.crossJoin(F.broadcast(ng)).crossJoin(F.broadcast(nm))
    return row.select(
        "n_candidates", "n_gold", "n_matched",
        F.lit(total).cast("long").alias("total_pairs"),
        F.when(
            F.lit(total) > 0,
            F.expr(f"(({total} - n_candidates) * 1000000) DIV {total}"),
        ).alias("reduction_ratio_ppm"),
        F.when(
            F.col("n_gold") > 0,
            F.expr("(n_matched * 1000000) DIV n_gold"),
        ).alias("pair_completeness_ppm"),
        F.when(
            F.col("n_candidates") > 0,
            F.expr("(n_matched * 1000000) DIV n_candidates"),
        ).alias("pair_quality_ppm"),
    )


def bcubed_metrics(
    predicted: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """B-cubed evaluation of an ER clustering against gold -> ONE row
    ``(n_records, bcubed_precision_ppm, bcubed_recall_ppm,
    bcubed_f1_ppm)`` (Bagga & Baldwin, COLING'98) — the ER quality
    metric that, unlike pairwise P/R, never materializes pairs: each
    record scores |its-pred-cluster ∩ its-gold-cluster| over its pred
    (precision) / gold (recall) cluster size, and the corpus score is
    the record average. That per-record formulation is exactly what
    distributes: three map-side-combinable counts (pred size, gold
    size, intersection size keyed on the cluster-pair) joined back —
    a 10^9-member mega-cluster costs three group-bys, not 10^18 pairs,
    which is why B-cubed is THE metric to run on a full-corpus dedup.

    Exact-integer discipline: per-record ratios are truncated ppm
    (``isize * 1e6 DIV size``), the average truncates again (``sum DIV
    n``), and F1 is ``2*P*R DIV (P+R)`` in ppm — documented double
    truncation (error < 2e-6), bit-identical in any engine. Records
    present in only one input are dropped by the inner join (score the
    overlap; coverage differences are a separate count to audit).
    """
    p = predicted.select(F.col(id_col).cast("string").alias("id"),
                         F.col(cluster_col).cast("string").alias("pc"))
    g = gold.select(F.col(id_col).cast("string").alias("id"),
                    F.col(cluster_col).cast("string").alias("gc"))
    rec = p.join(g, "id")
    psize = rec.groupBy("pc").agg(F.count(F.lit(1)).alias("_ps"))
    gsize = rec.groupBy("gc").agg(F.count(F.lit(1)).alias("_gs"))
    isize = rec.groupBy("pc", "gc").agg(F.count(F.lit(1)).alias("_is"))
    scored = (
        rec.join(isize, ["pc", "gc"])
        .join(psize, "pc")
        .join(gsize, "gc")
        .select(
            F.expr("_is * 1000000 DIV _ps").alias("_p"),
            F.expr("_is * 1000000 DIV _gs").alias("_r"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.expr("sum(_p) DIV count(1)").alias("bcubed_precision_ppm"),
        F.expr("sum(_r) DIV count(1)").alias("bcubed_recall_ppm"),
    ).select(
        "n_records", "bcubed_precision_ppm", "bcubed_recall_ppm",
        F.when(
            F.col("bcubed_precision_ppm") + F.col("bcubed_recall_ppm") > 0,
            F.expr("2 * bcubed_precision_ppm * bcubed_recall_ppm "
                   "DIV (bcubed_precision_ppm + bcubed_recall_ppm)"),
        ).alias("bcubed_f1_ppm"),
    )
