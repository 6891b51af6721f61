"""End-to-end web-corpus curation recipe.

Composes this repo's curation operators — each individually
oracle/parity-tested — into the pipeline a training-data team actually
runs over a crawl, in the order the literature converged on
(CCNet/RefinedWeb/Gopher-style): annotate → filter → redact →
boilerplate removal → exact dedup → near dedup → decontaminate
(→ optional BPE tokenization). Every stage is lazy Ray Data, so the
streaming executor pipelines them with backpressure; nothing here
materializes the corpus — except the optional ``bpe_merges`` stage,
which materializes the CURATED output once because tokenizer training
needs a full pass (documented at the stage) — and every regime choice
(broadcast vs join) defers to the per-op ``mode="auto"`` probes
(ops/regime.py), so the same call scales from a laptop sample to the
100 TB crawl.

This is a RECIPE, not new machinery: the value is the audited
composition (stage order, which columns flow where, one fused
annotate+filter pass instead of three) and a single entry point a
reference user can swap in.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .clean import redact
from .dedup import exact_dedup, near_dedup
from .textstats import LanguageId, QualityScorer

__all__ = ["curate_web_corpus", "AnnotateFilter"]


class AnnotateFilter:
    """Fused actor stage: language-ID + quality score + keep-filter in
    ONE pass over each batch (the two scorers share the batch; fusing
    avoids shipping the text column through two extra stages). Keeps
    the original columns and appends ``lang_pred``/``quality_score``
    for the surviving rows."""

    def __init__(self, text_col: str, keep_langs: tuple[str, ...],
                 min_quality: float):
        self.text_col = text_col
        self.lid = LanguageId(text_col)
        self.qs = QualityScorer(text_col)
        self.keep = pa.array(sorted(keep_langs), pa.string()) \
            if keep_langs else None
        self.min_quality = min_quality

    def __call__(self, batch: pa.Table) -> pa.Table:
        lang = self.lid(batch).column("lang_pred")
        score = self.qs(batch).column("quality_score")
        out = batch.append_column("lang_pred", lang) \
                   .append_column("quality_score", score)
        mask = pc.greater_equal(score, self.min_quality)
        if self.keep is not None:
            mask = pc.and_(mask, pc.is_in(lang, value_set=self.keep))
        return out.filter(mask)


def curate_web_corpus(ds, *, text_col: str = "text",
                      key_col: str = "doc_id",
                      html_col: str | None = None,
                      keep_langs: tuple[str, ...] | None = ("en",),
                      min_quality: float = 0.2,
                      lm_model: dict | None = None,
                      lm_min_logprob: float | None = None,
                      pii: bool = True,
                      boilerplate_max_count: int | None = 1,
                      line_sep: str = "\n",
                      span_dedup: bool = False,
                      span_mask_bits: int = 8,
                      near: bool = True,
                      jaccard_threshold: float = 0.8,
                      ref_ds=None,
                      bpe_merges: int | None = None,
                      bpe_prune_min_count: int = 2,
                      bpe_max_words: int | None = None,
                      concurrency=4):
    """Curate a web corpus end to end; returns the lazy curated Dataset
    (original columns + ``lang_pred`` + ``quality_score``).

    Stages (each optional via its parameter, each scale-audited in its
    own module):

    0. ``html.extract_text`` when ``html_col`` is given — raw-crawl
       entry point: html→text extraction writes ``text_col`` first.
    1. ``AnnotateFilter`` actor pool — language-ID + quality score +
       threshold/language filter, one fused pass.
    1b. ``lm.score_char_lm`` — CCNet LM perplexity gate when
       ``lm_model`` is given: annotates ``lm_logprob`` and, if
       ``lm_min_logprob`` is set, drops docs below it (the
       head+middle cut; train the model once with
       `lm.train_char_lm` and reuse it across runs).
    2. ``clean.redact`` — PII scrubbing, vectorized RE2 (``pii``).
    3. ``clean.line_dedup`` mode="auto" — cross-document boilerplate
       line removal (``boilerplate_max_count``; None skips).
    4. ``cdc.dedup_spans`` mode="auto" — alignment-robust duplicated-
       SPAN removal, Lee-et-al-style exact substring dedup
       (``span_dedup``; off by default — it rewrites text at chunk
       granularity, a policy decision).
    5. ``dedup.exact_dedup`` mode="auto" — one survivor per exact text.
    6. ``dedup.near_dedup`` — MinHash-LSH → Jaccard verify → anti-join
       (``near``).
    7. ``decontam.decontaminate`` mode="auto" — n-gram test-set
       decontamination when ``ref_ds`` is given.
    8. ``bpe.train_bpe`` + ``tokenize_bpe`` when ``bpe_merges`` is
       given — trains a byte-level BPE on the SURVIVING corpus (the
       text the model will actually see) and appends ``n_tokens_bpe``,
       the real-token count that token-budget sampling and
       ``packing.pack_sequences(tokens_col=...)`` consume downstream.
       This stage MATERIALIZES the curated corpus once (training needs
       a full pass; without it the dedup shuffles would re-execute for
       the tokenize pass) — the recipe stays lazy end to end only when
       ``bpe_merges`` is None.

    Order rationale: filters first (cheapest per surviving byte),
    redaction before any hashing so PII never enters dedup state, line
    and span dedup before document dedup (rewriting text changes
    document equality), decontamination last (the test-set n-grams
    must be matched against the text that will actually be trained
    on).

    Actor pools here AUTOSCALE from 1 (``(1, concurrency)``): a
    composed pipeline stacks several pools plus shuffle aggregator
    actors in ONE streaming plan, and fixed-size pools can pin every
    cluster CPU and deadlock the aggregators (reproduced at 4 CPUs —
    2 annotate + 2 line-filter actors starved the line-frequency
    shuffle forever). Min-1 pools let the executor rebalance."""
    pool = (1, concurrency) if isinstance(concurrency, int) else concurrency
    if html_col is not None:
        # raw-crawl entry: html→text extraction (ops/html.py) becomes
        # stage 0, writing text_col; everything downstream curates the
        # extracted text
        from .html import extract_text
        ds = extract_text(ds, html_col=html_col, out_col=text_col)
    ds = ds.map_batches(
        AnnotateFilter, fn_constructor_kwargs={
            "text_col": text_col,
            "keep_langs": tuple(keep_langs) if keep_langs else (),
            "min_quality": min_quality},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool)
    if lm_model is not None:
        from .lm import score_char_lm
        ds = score_char_lm(ds, lm_model, text_col=text_col)
        if lm_min_logprob is not None:
            ds = ds.filter(expr=f"lm_logprob >= {float(lm_min_logprob)!r}")
    if pii:
        ds = ds.map_batches(redact, fn_kwargs={"text_col": text_col},
                            batch_format="pyarrow", zero_copy_batch=True)
    if boilerplate_max_count is not None:
        from .clean import line_dedup
        ds = line_dedup(ds, text_col=text_col, id_col=key_col,
                        max_count=boilerplate_max_count, sep=line_sep,
                        mode="auto", concurrency=pool)
    if span_dedup:
        from .cdc import dedup_spans
        ds = dedup_spans(ds, text_col=text_col, key_col=key_col,
                         mask_bits=span_mask_bits, mode="auto")
    ds = exact_dedup(ds, text_col, key_col, mode="auto")
    if near:
        ds = near_dedup(ds, text_col=text_col, key_col=key_col,
                        jaccard_threshold=jaccard_threshold,
                        concurrency=pool)
    if ref_ds is not None:
        from .decontam import decontaminate
        ds = decontaminate(ds, ref_ds, text_col=text_col,
                           id_col=key_col, mode="auto")
    if bpe_merges is not None:
        # training the tokenizer ON the curated output means its word
        # statistics reflect exactly the text the model will see. The
        # train pass must consume the full pipeline, so the curated
        # corpus is MATERIALIZED here (object store, spillable) —
        # otherwise Ray would re-execute the expensive dedup shuffles
        # a second time for the tokenize pass. This is the one stage
        # that breaks the recipe's all-lazy shape, by necessity, and
        # only when requested. `bpe_prune_min_count`/`bpe_max_words`
        # bound the driver word table (see ops/bpe.py on what pruning
        # approximates — on a small or highly diverse curated corpus,
        # lower the prune to 1 or the merge table degenerates).
        from .bpe import tokenize_bpe, train_bpe
        ds = ds.materialize()
        model = train_bpe(ds, num_merges=bpe_merges, text_col=text_col,
                          prune_min_count=bpe_prune_min_count,
                          max_words=bpe_max_words)
        ds = tokenize_bpe(ds, model, text_col=text_col)
    return ds
