"""LLM-training-data pipeline operators (beyond-reference surface,
BASELINE.json north_star): deduplication, similarity search, text
analysis, sampling/packing, multimodal column plumbing — all designed
for 100 TB scale (no driver materialization, shuffle only where
semantically required).
"""

from .cluster import (connected_components, near_dedup,
                      near_dedup_incremental, semantic_dedup)
from .dedup import (
    dedup_lines, exact_dedup, minhash_lsh_pairs, minhash_signatures,
    ngram_jaccard, ngram_span_pairs, remove_duplicate_spans, simhash,
    simhash_pairs,
)
from .sampling import (
    hash_sample, pack_sequences, pack_shards, quality_sample,
    stratified_hash_sample, stratified_topk_sample, temperature_sample,
)
from .similarity import (
    cosine_join, cosine_topk, embedding_near_dupes, kmeans_clusters,
    lsh_ann_topk, nearest_centroid,
)
from .bpe import bpe_encode, bpe_token_count, bpe_train
from .classifier import (fit_logistic, quality_features,
                         score_logistic)
from .decontam import (contaminated_ids, decontaminate,
                       decontaminate_fuzzy, decontaminate_semantic,
                       fuzzy_contamination_pairs, semantic_contamination)
from .dedup import ngram_containment
from .dsir import (dsir_sample, dsir_weights, fit_log_ratios,
                   hashed_gram_buckets)
from .htmltext import extract_page, extract_text
from .mixing import fit_domain_weights, mixture_sample
from .pca import pca_fit, pca_project
from .office import (encode_docx, encode_epub, encode_odt, encode_pptx,
                     extract_office_bytes, office_text, sniff_zip_doc)
from .doctext import document_text, extract_document_bytes
from .pdf import encode_pdf, extract_pdf_bytes, pdf_text
from .rtf import encode_rtf, extract_rtf_bytes, rtf_text
from .crawl import (encode_sitemap, parse_robots,
                    parse_sitemap_bytes, robots_allowed,
                    robots_filter, sitemap_urls)
from .code import code_quality, python_facts_bytes, python_source_facts
from .eml import (encode_eml, encode_mbox, eml_text, extract_eml_bytes,
                  split_mbox)
from .markup import (latex_to_text, markdown_to_text, md_escape,
                     strip_latex, strip_markdown, tex_escape)
from .notebook import encode_ipynb, extract_ipynb_bytes
from .sampling import budget_sample
from .subtitles import (encode_srt, encode_vtt, extract_subtitles_bytes,
                        parse_srt, parse_vtt, subtitle_cues)
from .text import (
    chunk_documents, fingerprint, gopher_filter, lang_id,
    perplexity_buckets, quality_score, shingles, token_count,
)

__all__ = [
    "exact_dedup", "dedup_lines", "minhash_signatures",
    "minhash_lsh_pairs", "ngram_jaccard", "ngram_span_pairs",
    "remove_duplicate_spans", "simhash", "simhash_pairs",
    "connected_components", "near_dedup", "near_dedup_incremental",
    "semantic_dedup",
    "hash_sample", "stratified_hash_sample", "stratified_topk_sample",
    "temperature_sample", "quality_sample", "pack_shards",
    "pack_sequences",
    "cosine_topk", "lsh_ann_topk", "embedding_near_dupes", "cosine_join",
    "nearest_centroid", "kmeans_clusters",
    "token_count", "quality_score", "lang_id", "fingerprint", "shingles",
    "gopher_filter", "chunk_documents",
    "perplexity_buckets", "ngram_containment", "pca_fit", "pca_project",
    "budget_sample", "bpe_train", "bpe_encode", "bpe_token_count",
    "contaminated_ids", "decontaminate", "decontaminate_fuzzy",
    "fuzzy_contamination_pairs", "semantic_contamination",
    "decontaminate_semantic",
    "hashed_gram_buckets", "fit_log_ratios", "dsir_weights",
    "dsir_sample",
    "quality_features", "fit_logistic", "score_logistic",
    "extract_page", "extract_text",
    "extract_pdf_bytes", "encode_pdf", "pdf_text",
    "fit_domain_weights", "mixture_sample",
    "markdown_to_text", "latex_to_text", "md_escape", "tex_escape",
    "strip_markdown", "strip_latex",
    "extract_eml_bytes", "split_mbox", "encode_eml", "encode_mbox",
    "eml_text",
    "parse_srt", "parse_vtt", "extract_subtitles_bytes", "encode_srt",
    "encode_vtt", "subtitle_cues",
    "extract_ipynb_bytes", "encode_ipynb",
    "code_quality", "python_facts_bytes", "python_source_facts",
    "parse_robots", "robots_allowed", "robots_filter",
    "parse_sitemap_bytes", "encode_sitemap", "sitemap_urls",
]
