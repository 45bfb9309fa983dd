"""ontoweaver_spark — a PySpark-native declarative table->knowledge-graph
mapping engine with the capabilities of oncodash/ontoweaver (reference at
/root/reference, v1.8.13), re-architected Spark-first.

A YAML mapping turns each input row into a subject node, maps columns to
object nodes + typed edges or to properties, then a fusion stage merges
duplicates — but here the mapping compiles to declarative DataFrame
projections (zero-shuffle extraction) plus two groupBy aggregations
(fusion), instead of the reference's per-row Python interpretation.

Public API (mirrors the reference's ``extract`` / ``reconciliate`` /
``weave`` entry points, /root/reference/src/ontoweaver/__init__.py:309-558):

    from ontoweaver_spark import extract, reconciliate, weave
    nodes, edges = extract(df, mapping_dict_or_yaml, affix="none")
    fnodes, fedges = reconciliate(nodes, edges, reconciliate_sep=",")
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame

from .compiler import ExtractResult, compile_mapping, with_row_index
from .fusion import (
    FusionError,
    format_for_export,
    merge_into_graph,
    reconciliate,
    reconciliate_edges,
    reconciliate_nodes,
    suggest_salt,
)
from .decontam import contamination_report, decontaminate
from .graphstats import (
    bootstrap_percolation,
    bowtie_decomposition,
    onion_layers,
    propagate_labels,
    refex_features,
    butterfly_count,
    core_numbers,
    degree_histogram,
    degree_stats,
    diameter_double_sweep,
    eigenvector_centrality,
    four_clique_counts,
    katz_fixed_point,
    maximal_matching,
    neighbor_jaccard,
    assign_edge_partitions,
    pagerank_fixed_point,
    partition_quality,
    spam_mass,
    ppr_forward_push,
    ppr_sweep_cut,
    reciprocity,
    rich_club,
    salsa_scores,
    simrank_scores,
    square_count,
    structural_twins,
    top_hubs,
    transitive_reduction,
    truss_numbers,
    wl_colors,
)
from .neo4j_export import write_neo4j_import
from .ids import affix_id
from .linking import (
    bcubed_metrics,
    blocking_metrics,
    fold_diacritics,
    canonical_entity,
    spot_mentions,
    canonical_url,
    comention_edges,
    disambiguate_by_context,
    disambiguate_by_prior,
    entity_prior,
    link_entities,
    truth_finder,
)
from .similarity import rank_metrics, retrieval_metrics
from .webdoc import (
    extract_embedded_jsonld,
    infer_table_column_types,
    table_rows_to_frame,
    extract_html_tables,
    extract_meta_tags,
    extract_microdata,
    hearst_hypernyms,
    meronym_parts,
    acronym_pairs,
    qualify_with_first_date,
    breadcrumb_trails,
    copula_isa,
    extract_rdfa,
    link_rel_edges,
    aka_aliases,
    definition_pairs,
    contrast_pairs,
    cohyponym_pairs,
    appositive_relations,
    quote_attributions,
    numeric_facts,
    kv_type_profile,
    harvest_yield,
    citation_mentions,
    identifier_mentions,
    markdown_sections,
    markdown_section_paths,
    markdown_section_text,
)
from .layout import zorder_key, zorder_layout
from .nulls import is_not_null
from .ontology import (
    automap_to_targets,
    characteristic_sets,
    class_property_profile,
    functional_violations,
    graph_from_triples,
    ifp_sameas_candidates,
    subclass_closure,
    subclass_edges_from_triples,
    triple_support,
    numeric_consensus,
)
from .sampling import hash_split, skyline, stratified_sample
from .textops import annotator_agreement, corpus_stats, extract_dates, extract_geo, extract_quantities, rake_keyphrases, readability, script_profile, textrank_keywords
from .sessions import session_stats, sessionize
# urls.canonical_url is intentionally NOT re-exported at package level:
# linking.canonical_url (the entity-identity key) already owns the name;
# the crawl-snapshot variant is reached as ontoweaver_spark.urls.*
from .urls import latest_per_url, url_features
from .validate import (
    graph_integrity,
    graph_props_frame,
    load_shapes,
    k_anonymity_report,
    quarantine,
    shacl_validate,
    validate_input,
)
from .registry import import_from_path, register, register_all
from .session import get_spark, tune_session
from .spec import MappingError, MappingSpec, TransformerSpec, load_mapping, parse_mapping

__version__ = "0.1.0"

__all__ = [
    "extract", "reconciliate", "reconciliate_nodes", "reconciliate_edges",
    "weave", "format_for_export", "compile_mapping", "with_row_index",
    "load_mapping", "parse_mapping", "MappingSpec", "TransformerSpec",
    "MappingError", "FusionError", "register", "register_all",
    "import_from_path", "get_spark", "tune_session", "affix_id",
    "is_not_null", "canonical_url", "canonical_entity", "link_entities",
    "comention_edges", "validate_input", "quarantine", "graph_integrity",
    "merge_into_graph", "suggest_salt",
    "subclass_closure", "subclass_edges_from_triples", "automap_to_targets",
    "stratified_sample", "hash_split",
    "degree_stats", "top_hubs", "degree_histogram", "pagerank_fixed_point",
    "write_neo4j_import", "sessionize", "session_stats",
    "contamination_report", "decontaminate", "latest_per_url",
    "corpus_stats",
    "butterfly_count", "neighbor_jaccard", "transitive_reduction",
    "wl_colors", "core_numbers", "maximal_matching", "diameter_double_sweep",
    "katz_fixed_point", "reciprocity", "square_count", "skyline",
    "simrank_scores", "structural_twins", "rank_metrics",
    "retrieval_metrics", "disambiguate_by_context", "disambiguate_by_prior",
    "extract_embedded_jsonld", "extract_meta_tags", "extract_microdata",
    "extract_html_tables", "zorder_key", "zorder_layout",
    "refex_features", "propagate_labels", "rake_keyphrases",
    "table_rows_to_frame", "onion_layers", "spot_mentions",
    "readability", "annotator_agreement", "bowtie_decomposition",
    "graph_from_triples", "k_anonymity_report", "url_features",
    "textrank_keywords", "script_profile", "infer_table_column_types",
    "shacl_validate", "functional_violations", "ifp_sameas_candidates",
    "blocking_metrics", "fold_diacritics", "spam_mass",
    "assign_edge_partitions", "partition_quality",
    "class_property_profile", "characteristic_sets", "bcubed_metrics",
    "graph_props_frame", "load_shapes",
    "hearst_hypernyms", "meronym_parts", "extract_dates",
    "extract_quantities", "qualify_with_first_date", "extract_geo",
    "acronym_pairs",
    "breadcrumb_trails", "copula_isa", "extract_rdfa", "link_rel_edges",
    "aka_aliases", "definition_pairs", "contrast_pairs", "cohyponym_pairs",
    "appositive_relations", "quote_attributions", "numeric_facts",
    "triple_support", "numeric_consensus",
    "kv_type_profile", "harvest_yield", "citation_mentions",
    "identifier_mentions", "markdown_sections", "markdown_section_paths",
    "markdown_section_text",
]


def extract(
    df: DataFrame,
    mapping: Union[dict, str, MappingSpec],
    affix: str = "none",
    type_affix_sep: str = ":",
    validate_mode: str = "raise",
) -> tuple[DataFrame, DataFrame]:
    """Run a mapping over a DataFrame -> raw (pre-fusion) nodes and edges.

    Analog of ``ontoweaver.extract_table``
    (/root/reference/src/ontoweaver/__init__.py:533-558). A mapping-level
    ``validate:`` section fails loudly on invalid rows by default
    (``validate_mode="raise"``, matching the reference's InputValidator);
    pass ``"filter"`` to silently drop or ``"report"`` for counted drops
    (see :func:`ontoweaver_spark.compiler.compile_mapping`).
    """
    res = compile_mapping(
        df, mapping, affix=affix, type_affix_sep=type_affix_sep,
        validate_mode=validate_mode,
    )
    return res.nodes, res.edges


def weave(
    df: DataFrame,
    mapping: Union[dict, str, MappingSpec],
    affix: str = "none",
    type_affix_sep: str = ":",
    reconciliate_sep: str = "|",
    raise_errors: bool = True,
    salt: int = 0,
    validate_mode: str = "raise",
) -> tuple[DataFrame, DataFrame]:
    """extract + reconciliate in one call (analog of ``ontoweaver.weave``,
    /root/reference/src/ontoweaver/__init__.py:309-355). Returns fused
    (nodes, edges) with properties still as array<string>; apply
    :func:`format_for_export` to render final scalar/joined strings."""
    nodes, edges = extract(
        df, mapping, affix=affix, type_affix_sep=type_affix_sep,
        validate_mode=validate_mode,
    )
    return reconciliate(
        nodes, edges,
        reconciliate_sep=reconciliate_sep,
        raise_errors=raise_errors,
        salt=salt,
    )
