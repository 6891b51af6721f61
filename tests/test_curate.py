"""End-to-end curation recipe (ops/curate.py): the composed pipeline a
training-data team runs — annotate/filter → redact → line dedup →
exact dedup → near dedup → decontaminate — with planted rows that each
exercise exactly one stage, plus a lazy run over the real table."""

import pyarrow as pa

from parquet_rs_ray.ops.curate import curate_web_corpus

SF = "/root/testdata/sf0.001"

BANNER = "accept all cookies to continue"
GOOD_A = ("the quick brown fox jumps over the lazy dog and then "
          "the dog sleeps while the fox runs away into the woods "
          "because it was a long day for all of the animals there")
TEXT_B = ("we walked along the river in the morning and the light "
          "was soft on the water while the birds were calling from "
          "the far bank and nobody else was there to see it happen")
TEXT_C = ("после долгой дороги он вернулся домой и увидел что всё "
          "изменилось норемонт был сделан хорошо и даже сад вырос "
          "plus the secret eval question here and some more words")


def _planted_corpus():
    rows = [
        (1, BANNER + "\n" + GOOD_A),        # banner stripped -> GOOD_A
        (2, GOOD_A),                        # exact dup of stripped 1
        (3, BANNER + "\n" + GOOD_A + " marker"),  # near-dup of 1
        (4, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),   # low quality
        (5, "zzzq qqzz xxyy yyxx wwvv vvww uuzz zzuu " * 6),  # no lang
        (6, BANNER + "\n" + TEXT_B + " contact alice@example.com now"),
        (7, TEXT_C),                        # contaminated by ref below
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    })


def test_curate_planted_rows(ray_session):
    import ray
    ref = ray.data.from_arrow(pa.table(
        {"text": pa.array(["plus the secret eval question here"])}))
    out = curate_web_corpus(
        ray.data.from_arrow(_planted_corpus()),
        keep_langs=("en",), min_quality=0.2,
        boilerplate_max_count=2,        # banner appears 3x -> stripped
        ref_ds=ref, concurrency=2).to_pandas().sort_values("doc_id")
    # 4 quality-filtered; 5 lang-filtered; 7 decontaminated (ru text
    # would also fail the lang gate — the gram hit is asserted below
    # on its own); banner stripped from 1/3/6 (count 3 > 2); 2 then
    # exact-dups into 1; 3 near-dups into 1; 6 survives redacted.
    assert list(out["doc_id"]) == [1, 6]
    assert out.iloc[0]["text"] == GOOD_A            # banner gone
    t6 = out[out.doc_id == 6].iloc[0]["text"]
    assert "alice@example.com" not in t6 and "[EMAIL]" in t6
    assert set(out.columns) >= {"doc_id", "text", "lang_pred",
                                "quality_score"}
    assert (out["lang_pred"] == "en").all()
    # the decontamination stage specifically (not the lang gate) drops
    # a contaminated ENGLISH doc too
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([
                        GOOD_A,
                        TEXT_B + " plus the secret eval question here"])})
    out2 = curate_web_corpus(
        ray.data.from_arrow(tbl), keep_langs=("en",), min_quality=0.2,
        boilerplate_max_count=None, near=False, ref_ds=ref,
        concurrency=2).to_pandas()
    assert list(out2["doc_id"]) == [1]


def test_curate_real_documents_lazy_and_monotone(ray_session):
    """On the real table: stages only remove rows and every stage
    toggle is wired."""
    import ray
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    n0 = ds.count()
    # every optional stage off: only annotate (no-op gates) + exact
    baseline = curate_web_corpus(ds, keep_langs=None, min_quality=0.0,
                                 boilerplate_max_count=None, near=False,
                                 pii=False, concurrency=2).count()
    assert 0 < baseline <= n0
    curated = curate_web_corpus(ds, keep_langs=None, min_quality=0.1,
                                near=False, concurrency=2).count()
    assert 0 < curated <= baseline


def test_curate_from_raw_html(ray_session):
    """html_col entry: stage 0 extracts text from the crawl's html
    column, downstream stages curate the EXTRACTED text."""
    import ray
    from parquet_rs_ray.webgen import make_web_table

    tbl = make_web_table(rows=120, seed=17)
    tbl = tbl.append_column(
        "doc_id", pa.array(range(120), pa.int64()))
    out = curate_web_corpus(
        ray.data.from_arrow(tbl), html_col="html", keep_langs=None,
        min_quality=0.0, boilerplate_max_count=None, near=False,
        pii=False, concurrency=2).to_pandas()
    assert 0 < len(out) <= 120
    assert "text" in out.columns
    got = out.set_index("doc_id").text
    assert (~got.str.contains("<", regex=False)).all()
    # null-html rows were unscorable and must not survive with text
    null_ids = [i for i, h in enumerate(tbl.column("html").to_pylist())
                if h is None]
    assert not (set(null_ids) & set(out.doc_id)) or \
        out.set_index("doc_id").text.reindex(null_ids).isna().all()


def test_curate_span_dedup_stage(ray_session):
    """span_dedup=True removes a long span duplicated across two
    otherwise-distinct surviving docs; the winner keeps it intact."""
    import ray

    # collision-free token streams: no chunk content repeats except the
    # planted span itself (a tiny vocabulary would create accidental
    # WITHIN-doc duplicate chunks, which the op also removes)
    span = " ".join(f"span{i:04d}" for i in range(400))
    uniq1 = " ".join(f"one{i:03d}" for i in range(60))
    uniq2 = " ".join(f"two{i:03d}" for i in range(70))
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([uniq1 + " " + span, uniq2 + " " + span]),
    })
    ds = ray.data.from_arrow(tbl)
    kw = dict(keep_langs=None, min_quality=0.0, pii=False,
              boilerplate_max_count=None, near=False, concurrency=2)
    off = curate_web_corpus(ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert span in off.text[0] and span in off.text[1]
    on = curate_web_corpus(ds, span_dedup=True, span_mask_bits=6,
                           **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert span in on.text[0]                    # winner keeps it
    assert len(on.text[1]) < len(off.text[1]) - 0.6 * len(span)
    assert on.text[1].startswith(uniq2[:30])     # unique prefix survives


def test_curate_lm_gate(ray_session):
    """With lm_model set the recipe annotates lm_logprob; with
    lm_min_logprob it drops exactly the docs scoring below the cut
    (the CCNet head+middle gate)."""
    import numpy as np
    import ray

    from parquet_rs_ray.ops.lm import score_char_lm, train_char_lm

    common = ("the quick brown fox jumps over the lazy dog and then "
              "runs far away into the quiet woods tonight again")
    docs = [common, common.replace("fox", "cat"),
            "zzqq xxvv wwkk jjqq zzqq xxvv wwkk jjqq zzqq xxvv wwkk"]
    tbl = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(tbl)
    # reference model from the GOOD docs only (training on the corpus
    # itself would let the self-repeating gibberish score well)
    model = train_char_lm(ray.data.from_arrow(tbl.slice(0, 2)))
    scored = score_char_lm(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cut = (scored.lm_logprob[1] + scored.lm_logprob[2]) / 2
    assert scored.lm_logprob[2] < cut < scored.lm_logprob[1]
    kw = dict(keep_langs=None, min_quality=0.0, pii=False,
              boilerplate_max_count=None, near=False, concurrency=2)
    out = curate_web_corpus(ds, lm_model=model, lm_min_logprob=cut,
                            **kw).to_pandas()
    assert sorted(out.doc_id) == [0, 1]
    assert "lm_logprob" in out.columns
    # annotate-only: no cut, all survive with scores attached
    out2 = curate_web_corpus(ds, lm_model=model, **kw).to_pandas()
    assert len(out2) == 3 and out2.lm_logprob.notna().all()
