"""End-to-end corpus curation: the composition the individual operators
exist for — raw documents in, deduplicated training-ready documents out.

Stage order is chosen for scale, cheapest-first so each stage shrinks the
input of the next:

1. PII scrub           — codegen'd regexp chain, no shuffle.
1b. paragraph dedup    — (opt-in) corpus-wide first-occurrence paragraph
                         dedup; rewrites text before anything judges it.
1c. hot-span scrub     — (opt-in) exact-substring removal: token windows
                         repeated corpus-wide are cut (broadcast hot set,
                         row-local masking) — template mass the paragraph
                         stage misses when it is embedded mid-paragraph.
2. quality gate        — doc_stats + repetition_stats thresholds; drops
                         boilerplate before any hashing happens.
2b. classifier gate    — (opt-in) hashed-linear-classifier probability
                         threshold; broadcast weight join, explode-cheap.
2c. LM gate            — (opt-in) bigram-LM perplexity threshold; the LM
                         trains on a trusted reference corpus when given
                         (CCNet shape), else on the gated survivors.
3. exact dedup         — one shuffle on the content hash; removes the
                         cheap mass of byte-identical copies so MinHash
                         only sees near-dup candidates.
4. near-dup clusters   — MinHash→LSH star edges → connected components
                         → keep the min-id member per cluster.  Star
                         edges (O(bucket) per LSH bucket), NOT all
                         pairs (O(bucket²)): the sf1 scaling study
                         (BASELINE.md) measured the all-pairs shape at
                         18× superlinear on one 3.5k-doc boilerplate
                         bucket (6M of 60M joined rows), while star
                         edges stay ~linear (3.4→7.7 s at ×10 data) —
                         the only composition that survives 100 TB
                         with boilerplate-heavy corpora.

Every stage is a library operator with its own tests/oracle; this module
only wires them and is itself tested end-to-end.  At 100 TB each stage
boundary is a natural materialization point (write → read back) so a
failed later stage never recomputes the full chain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long, xxhash60
from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import fan_out
from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
    exact_dedup,
    keep_canonical,
    minhash_star_clusters,
)
from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
    doc_quality_stats,
    scrub_pii,
)


@dataclass(frozen=True, kw_only=True)
class CurateConfig:
    min_chars: int = 32
    min_quality: float = 0.5
    max_dup_line_ratio: float = 0.5
    max_top_bigram_ratio: float = 0.5
    minhash_perms: int = 16
    minhash_bands: int = 4
    shingle_n: int = 5
    jaccard_threshold: float = 0.8
    seed: int = 42
    scrub: bool = True
    # "xxhash" is the production fast path (single JVM intrinsic);
    # "md5" exists for oracle parity with DuckDB.  Clustering OUTPUT is
    # hash-choice-sensitive only at the margin (different minhash
    # families estimate Jaccard with the same error bound), so the
    # default for a real curation run is the fast one.
    hash_fn: str = "xxhash"
    # optional stages (r5), all off by default so the classic pipeline is
    # unchanged:
    # corpus-wide paragraph dedup BEFORE the quality gate (it rewrites
    # text, so everything downstream must see the deduped version);
    # paragraphs shorter than paragraph_min_chars always pass
    paragraph_dedup: bool = False
    paragraph_sep: str = "\n"
    paragraph_min_chars: int = 20
    # corpus-wide exact-substring (hot token-window) scrub AFTER paragraph
    # dedup: spans repeated >= hot_span_min_count times corpus-wide are cut
    # from every doc (Lee-et-al removal, scrub semantics).  None = off
    hot_span_window: int | None = None
    hot_span_min_count: int = 5
    # drop docs whose bigram-LM perplexity exceeds this (CCNet-style
    # gibberish gate); docs with <2 tokens have no bigrams and also drop
    # (conservative).  None = stage off
    max_perplexity: float | None = None
    # drop docs scoring below this under the hashed linear classifier;
    # None = stage off (weights come in via curate(classifier_weights=))
    min_clf_prob: float | None = None
    clf_num_features: int = 1 << 18
    # persisted-model paths (r6): production curate runs train the LM /
    # classifier ONCE (textops.lm_write / classifier_write) and reuse
    # them across batches and streams — when set, the corresponding gate
    # scores from disk instead of training inline, and the per-run
    # corpus scan disappears
    lm_path: str | None = None
    classifier_path: str | None = None
    # require every Gopher rule (textops.gopher_quality_flags defaults)
    # in addition to the built-in quality gate; off by default
    gopher: bool = False
    # r12: additionally require every published Gopher REPETITION rule
    # (textops.gopher_repetition_flags / GOPHER_REPETITION_THRESHOLDS)
    gopher_repetition: bool = False
    # language gate (r6): keep only docs whose lang_id prediction lands
    # in this set (e.g. ("en",)); "unknown" passes only if listed.
    # Empty tuple = stage off.  Runs with the quality gate (both are
    # row-local projections over the same text).
    allowed_langs: tuple[str, ...] = ()
    # r7: path to a TRAINED language-ID model (langid.lang_write) — when
    # set, the language gate predicts with the persisted NB model
    # (explode + broadcast weight join) instead of the stopword
    # heuristic; allowed_langs still names the languages kept
    lang_model_path: str | None = None
    # URL/domain front door (r6, operators/urlops) — all off unless
    # url_col names a column.  These run FIRST (narrow/broadcast-only,
    # so they cut corpus mass at scan cost before any text work):
    # blocklisted domains drop, canonical-URL dups collapse to the
    # min-id row, then any one domain is capped (in expectation) at
    # max_per_domain docs via the deterministic hash filter.
    url_col: str | None = None
    url_blocklist: tuple[str, ...] = ()
    url_dedup: bool = False
    max_per_domain: int | None = None
    # HTML front door (r9, operators/htmlops): when True the text column
    # arrives as raw HTML and the extraction stage (markup strip, entity
    # decode, CCNet-style line boilerplate drop) rewrites it to rendered
    # text FIRST — before scrub/stats/dedup, which all assume text.  One
    # codegen projection, no shuffle; off by default.
    html_extract: bool = False
    html_min_words: int = 3
    html_max_link_density: float = 0.5
    # incremental NEAR dedup vs history (r9): path to a persisted MinHash
    # signature store (dedup.minhash_write); batch rows near-duplicating
    # any history row (band collision + jaccard_threshold verify) drop.
    # Composes with curate(against_corpus=) — exact first, fuzzy second.
    against_sigs_path: str | None = None
    # CCNet perplexity partition (r9, textops.perplexity_buckets): keep
    # only these relative quality tiers ("head"/"middle"/"tail" of the
    # per-run perplexity distribution, lowest ppl = head).  Needs the
    # LM (lm_path, or inline-trained like max_perplexity).  Runs with /
    # after the absolute max_perplexity gate and reuses its scores —
    # setting both gates costs ONE scoring pass.  Empty tuple = off.
    keep_ppl_tiers: tuple[str, ...] = ()
    # PII density gate (r9, textops.pii_report): drop docs with MORE
    # than this many email/phone/IP hits — contact-scrape and directory
    # pages that scrubbing would reduce to tag soup.  Counts run on the
    # PRE-scrub text (scrub replaces the matches, so the gate must see
    # them first).  None = off.
    max_pii: int | None = None
    # zlib repetition gate (r9, textops.compression_stats): drop docs
    # whose compression ratio falls BELOW this floor — templated/looping
    # text the n-gram repetition rules miss (natural prose ≈ 0.3–0.6,
    # pathological repetition → 0.05).  None = off.
    min_compression_ratio: float | None = None
    # near-dup survivor rule (r9): "min_id" (the classic deterministic
    # pick) or "quality" — keep each cluster's highest-quality member
    # (dedup.keep_canonical_by over the SAME stats the quality gate
    # already materialized; ties → min id).  The right rule when
    # re-crawls improve pages.
    survivor: str = "min_id"
    # embedding-space eval decontamination (r10, similarity.
    # semantic_contamination): drop docs whose embedding's cosine
    # against ANY eval-set embedding reaches this threshold — the
    # paraphrase/translation leakage the shingle gates can't see.
    # Needs curate(doc_embeddings=, eval_embeddings=).  None = off.
    decon_cosine: float | None = None
    # "exact" = broadcast certification mode (recall 1.0, the default —
    # eval sets are benchmark-sized); "ivf" = probe mode for corpora
    # where even one broadcast-NLJ corpus pass is too hot
    decon_mode: str = "exact"
    # id column of the embedding tables when it differs from the doc
    # table's id_col (e.g. vec_id); None = same name
    decon_id_col: str | None = None
    # SPAN-level verbatim decontamination (r11, dedup.remove_eval_spans):
    # cut every token inside a run of this many tokens shared verbatim
    # with the eval corpus — the doc survives minus the quote.  Needs
    # curate(eval_corpus=); runs as a REWRITE stage right after HTML
    # extraction, before any gate reads the text (a doc scrubbed to
    # nothing then fails min_chars like any other short doc).  None =
    # off.  Completes the decon triad: shingle doc-drop
    # (against/fuzzy), embedding doc-drop (decon_cosine), span scrub.
    # CAVEAT (r12, ADVICE r11): a CONTAMINATED doc's surviving tokens are
    # re-joined with single spaces, so its newlines/tabs — including the
    # \n\n paragraph boundaries — collapse; paragraph_dedup (which runs
    # AFTER this stage) then sees exactly the scrubbed docs as single
    # paragraphs.  Untouched docs keep their text verbatim.  If paragraph
    # granularity matters for contaminated docs, scrub in a separate pass
    # after paragraph-level stages instead — or set
    # decon_span_preserve_seps below.
    decon_span_window: int | None = None
    # r12 (ADVICE r11): scrub positionally over \S+\s* pieces so every
    # SURVIVING token keeps its original trailing whitespace — paragraph
    # boundaries between kept tokens survive the scrub (batch lane only;
    # the streaming twin always space-joins).
    decon_span_preserve_seps: bool = False
    # vs-history EMBEDDING near-dup (r14, similarity.
    # semantic_dedup_against): path to a persisted IVF index
    # (similarity.ivf_index_write) built over HISTORY embeddings; batch
    # docs whose embedding's cosine against any probed history vector
    # reaches against_cosine drop.  Completes the vs-history matrix next
    # to against_corpus (exact text) and against_sigs_path (MinHash
    # text): this one catches the rewordings that share no n-grams with
    # history.  Needs curate(doc_embeddings=); decon_id_col maps the
    # embedding table's id as for decon_cosine.  None = off.
    against_embeddings_path: str | None = None
    against_cosine: float = 0.9
    against_nprobe: int = 4
    # r15 (daily-incremental recipes): when set, ``against_corpus`` is a
    # pre-hashed DIGEST table — md5-of-text strings in this column — the
    # history-store shape a daily pipeline appends to (16 bytes per
    # historical doc, never the text).  None = against_corpus is raw
    # text hashed at gate time.
    against_digest_col: str | None = None


def _stage_complete(path: str) -> bool:
    """A stage boundary is complete iff its parquet dir carries the
    ``_SUCCESS`` marker Spark writes after the LAST task commits — a
    killed run leaves no marker, so partial output is never resumed
    from.  Local-path check here (the test environment); at cluster
    scale the identical marker lands on the object store and the check
    is one LIST call."""
    import os

    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _check_stage_manifest(stage_dir: str, fingerprint: str) -> None:
    """Refuse to resume into a stage dir written under a DIFFERENT
    pipeline configuration — mixed-config boundaries would silently
    splice two different pipelines.  The manifest is one tiny JSON
    written before the first boundary."""
    import json
    import os

    mpath = os.path.join(stage_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            prior = json.load(f)
        if prior.get("fingerprint") != fingerprint:
            raise ValueError(
                f"stage_dir {stage_dir!r} was written by a different curate "
                f"configuration — resume would splice incompatible pipelines; "
                f"use a fresh stage_dir (or delete this one)"
            )
    else:
        os.makedirs(stage_dir, exist_ok=True)
        with open(mpath, "w") as f:
            json.dump({"fingerprint": fingerprint}, f)


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CurateConfig = CurateConfig(),
    classifier_weights: DataFrame | None = None,
    lm_corpus: DataFrame | None = None,
    against_corpus: DataFrame | None = None,
    doc_embeddings: DataFrame | None = None,
    eval_embeddings: DataFrame | None = None,
    eval_corpus: DataFrame | None = None,
    stage_dir: str | None = None,
    _trace: list | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns the kept documents with
    their original schema (text scrubbed when ``config.scrub``, rebuilt
    when ``config.paragraph_dedup``).

    ``_trace`` (r9, internal — use :func:`curate_audit`): a list the
    pipeline appends ``(stage_name, df_after_stage)`` to at every
    drop-capable stage boundary.  Tracing wraps each boundary in
    ``localCheckpoint(eager=False)`` so each stage computes ONCE and the
    audit anti-joins read the materialized boundary — the in-memory
    analog of the stage-boundary table writes the module docstring
    prescribes at cluster scale.  ``None`` (the default) leaves the
    plan untouched.

    ``lm_corpus``: trusted reference slice (Wikipedia-style) the
    perplexity gate's bigram LM trains on — the CCNet arrangement.  With
    ``None`` the LM trains on the gate's own survivors, which is only
    meaningful at corpus scale (common bigrams must accumulate large
    counts; on a handful of docs add-one smoothing flattens — or even
    inverts — the signal).

    ``against_corpus`` (r6): the INCREMENTAL batch mode — an existing
    curated corpus (or its digest table) whose content this batch must
    not duplicate.  Runs as the Bloom-gated exact check
    (``dedup.dedup_against_corpus``: definitely-new rows skip the join
    entirely) right after the batch's own exact dedup, so a daily batch
    curates against years of history without shuffling the history.

    ``stage_dir`` (r10): RESUMABLE staged execution — every drop-capable
    stage boundary (the same boundaries ``_trace`` checkpoints)
    materializes to ``{stage_dir}/{NN}_{stage}`` parquet and execution
    continues from the read-back, so a run that dies at stage 7 of a
    100 TB curate resumes from stage 6's output instead of redoing
    stages 1–6.  Completed boundaries (``_SUCCESS`` marker present) are
    loaded, and — because every stage is built behind a thunk — their
    construction-time driver work (Bloom builds, CC edge collects,
    percentile fits) is skipped too.  A ``manifest.json`` fingerprint
    of (config, id_col, text_col) PLUS the side-input identities (r11:
    the backing file lists of ``against_corpus`` / ``lm_corpus`` /
    ``doc_embeddings`` / ``eval_embeddings`` / ``classifier_weights``
    via ``DataFrame.inputFiles()`` — a metadata-only call) refuses
    resume under a different pipeline configuration OR after a side
    input changed on disk (a new benchmark release, an updated history
    table): stale decontaminate/against boundaries must recompute, not
    silently reload.  A side input not backed by files (an in-memory
    frame) contributes only a presence marker — callers of that shape
    must also keep its CONTENT fixed across resumes.  The main ``docs``
    input is still not fingerprinted — resume assumes the same
    immutable input table.  This is the programmatic form of the
    stage-boundary table writes the module docstring prescribes."""
    if stage_dir is not None:
        import hashlib

        def _side_id(df: DataFrame | None) -> tuple | None:
            if df is None:
                return None
            try:
                return tuple(sorted(df.inputFiles()))
            except Exception:
                return ("<unlisted>",)

        _check_stage_manifest(stage_dir, hashlib.sha256(
            repr((config, id_col, text_col,
                  _side_id(against_corpus), _side_id(lm_corpus),
                  _side_id(doc_embeddings), _side_id(eval_embeddings),
                  _side_id(classifier_weights), _side_id(eval_corpus))).encode()
        ).hexdigest())

    _stage_no = [0]

    def _mark(stage: str, build) -> DataFrame:
        """Close a drop-capable stage boundary.  ``build`` is a thunk (or
        a ready DataFrame) so that when ``stage_dir`` already holds this
        boundary, neither the stage's plan nor its construction-time
        driver work runs — the boundary is simply loaded."""
        _stage_no[0] += 1
        if stage_dir is not None:
            path = f"{stage_dir}/{_stage_no[0]:02d}_{stage}"
            if _stage_complete(path):
                df = docs.sparkSession.read.parquet(path)
            else:
                df = build() if callable(build) else build
                df.write.mode("overwrite").parquet(path)
                df = docs.sparkSession.read.parquet(path)
        else:
            df = build() if callable(build) else build
        if _trace is not None:
            df = df.localCheckpoint(eager=False)
            _trace.append((stage, df))
        return df

    if config.url_col is not None:
        # URL/domain front door: narrow filter → one canonical-key groupBy
        # → broadcast-frac cap.  Runs before ANY text stage because it is
        # the cheapest mass reducer a crawl corpus has (no text shuffled,
        # no regex over text).
        from dbc_informed_socketcan_to_parquet_spark.operators.urlops import (
            domain_cap as _domain_cap,
            domain_filter as _domain_filter,
            url_dedup as _url_dedup,
        )

        if config.url_blocklist:
            docs = _mark("url_blocklist", _domain_filter(
                docs, list(config.url_blocklist), url_col=config.url_col))
        if config.url_dedup:
            docs = _mark("url_dedup", _url_dedup(
                docs, url_col=config.url_col, id_col=id_col))
        if config.max_per_domain is not None:
            docs = _mark("domain_cap", _domain_cap(
                docs, config.max_per_domain, url_col=config.url_col,
                id_col=id_col, hash_fn=config.hash_fn,
            ).drop("keep_frac"))

    if config.html_extract:
        # HTML front door: rewrite raw HTML to rendered text before any
        # stage that assumes text (scrub regexes, quality stats, dedup
        # shingles).  Runs after the URL stages (those never read text)
        # and, like them, costs scan speed — one codegen projection.
        from dbc_informed_socketcan_to_parquet_spark.operators.htmlops import (
            extract_text as _extract_text,
        )

        docs = _extract_text(
            docs, html_col=text_col, out_col=text_col,
            min_words=config.html_min_words,
            max_link_density=config.html_max_link_density,
        )

    if config.decon_span_window is not None:
        # span-level verbatim decontamination (r11): a REWRITE stage like
        # scrub/html-extract — the quote is cut, the doc survives, and
        # every later gate (incl. min_chars on an emptied doc) judges the
        # scrubbed text.  Eval window hashes broadcast; corpus never
        # shuffles (dedup.remove_eval_spans keep_schema contract).
        if eval_corpus is None:
            raise ValueError(
                "decon_span_window set but eval_corpus not provided — the "
                "span scrub needs the eval corpus text")
        from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
            remove_eval_spans,
        )

        docs = remove_eval_spans(
            docs, eval_corpus, id_col=id_col, text_col=text_col,
            window_tokens=config.decon_span_window,
            hash_fn=_HASH_FNS[config.hash_fn], keep_schema=True,
            preserve_separators=config.decon_span_preserve_seps,
        )

    if config.max_pii is not None:
        # PII density gate: must see the PRE-scrub text (scrub replaces
        # the matches).  Row-local regexp-count projection + semi-join
        # on ids — the same gate shape as quality/language.
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import pii_report

        # NULL text counts as zero PII (regexp_count(NULL) is NULL, which
        # would silently drop the doc here and mislabel it 'pii' in the
        # audit funnel); null-text docs fall through to the quality gate
        # that is meant to catch them.
        ok = pii_report(docs, id_col, text_col).filter(
            F.coalesce(F.col("n_pii"), F.lit(0)) <= config.max_pii
        ).select(id_col)
        docs = _mark("pii", docs.join(ok, id_col, "left_semi"))

    # Fan out between the scrub and the stats battery: a few-file corpus
    # scans as file-count partitions, so without the exchange the text
    # stages would run ~2-wide on 32 cores (measured r5 at sf1).
    # Downstream stages inherit the width; at real scale the guard is a
    # no-op (functions/partitioning).
    out = scrub_pii(docs, text_col) if config.scrub else docs
    out = fan_out(out, force=True)

    if config.paragraph_dedup:
        # corpus-wide first-occurrence paragraph dedup (RefinedWeb shape):
        # rewrites text in place, so the quality gate below judges the
        # deduped document.  One materialization boundary — the rebuilt
        # text feeds every later stage (at cluster scale: a table write).
        from dbc_informed_socketcan_to_parquet_spark.operators.dedup import paragraph_dedup

        rebuilt = paragraph_dedup(
            out, id_col, text_col,
            sep=config.paragraph_sep, min_chars=config.paragraph_min_chars,
        ).localCheckpoint(eager=False)
        keep = [c for c in out.columns if c != text_col]
        out = (
            out.select(*keep)
            .join(rebuilt.select(id_col, F.col("text_dedup").alias(text_col)), id_col)
            .select(*docs.columns)
        )

    if config.hot_span_window is not None:
        # corpus-wide exact-substring scrub (Lee-et-al removal): template
        # spans repeated >= hot_span_min_count times are cut from every
        # doc.  Another text rewrite, so it runs with the other rewrite
        # stage (before anything judges the text); the hot set is
        # template-mass only, so it broadcasts at any corpus size.
        from dbc_informed_socketcan_to_parquet_spark.operators.dedup import remove_hot_spans

        rebuilt = remove_hot_spans(
            out, id_col, text_col,
            window_tokens=config.hot_span_window,
            min_count=config.hot_span_min_count,
            hash_fn=_HASH_FNS[config.hash_fn],
        ).localCheckpoint(eager=False)
        keep = [c for c in out.columns if c != text_col]
        out = (
            out.select(*keep)
            .join(rebuilt.select(id_col, F.col("clean_text").alias(text_col)), id_col)
            .select(*docs.columns)
        )

    # one shuffle-free projection (r4) — no doc_stats ⋈ repetition join.
    # The localCheckpoint is an OPTIMIZER BARRIER, not a convenience:
    # without it, predicate pushdown rewrites the quality filter through
    # the stats projection, substituting the scrub+stat DERIVATIONS into
    # every condition term (~20 copies of the regex chain per row — the
    # CASE WHEN branches in the stat definitions defeat codegen
    # subexpression elimination) and evaluating them at scan width.
    # Measured r5 at sf1: the quality semi-join alone was 57 s inlined
    # vs ~6 s with the filter reading materialized stat columns.  The
    # stats table is one short row per doc; at cluster scale the analog
    # is writing it to a table — the stage boundary the module docstring
    # prescribes.
    stats = doc_quality_stats(out, id_col, text_col)
    if stage_dir is not None:
        # staged runs persist the stats table itself (it is both the
        # quality gate's input and the survivor="quality" ranking key, so
        # a resume past the quality boundary must not recompute the text
        # battery); the parquet round-trip doubles as the barrier below
        aux = f"{stage_dir}/aux_quality_stats"
        if not _stage_complete(aux):
            stats.write.mode("overwrite").parquet(aux)
        stats = docs.sparkSession.read.parquet(aux)
    else:
        stats = stats.localCheckpoint(eager=False)
    good_ids = stats.filter(
        (F.col("n_chars") >= config.min_chars)
        & (F.col("quality") >= config.min_quality)
        & (F.col("dup_line_ratio") <= config.max_dup_line_ratio)
        & (F.col("top_bigram_ratio") <= config.max_top_bigram_ratio)
    ).select(id_col)
    out = _mark("quality", out.join(good_ids, id_col, "left_semi"))

    if config.allowed_langs:
        # language gate: the heuristic is a row-local projection, the
        # trained model (lang_model_path, r7) an explode + broadcast
        # weight join; either way the same semi-join-on-ids shape as
        # every other gate so the doc stream itself is filtered, not
        # rebuilt
        if config.lang_model_path is not None:
            from dbc_informed_socketcan_to_parquet_spark.operators.langid import (
                lang_id_from,
            )

            predicted = lang_id_from(
                out, config.lang_model_path, id_col=id_col, text_col=text_col
            )
        else:
            from dbc_informed_socketcan_to_parquet_spark.operators.textops import lang_id

            predicted = lang_id(out, id_col, text_col)
        lang_ids = predicted.filter(
            F.col("predicted_lang").isin(list(config.allowed_langs))
        ).select(id_col)
        out = _mark("language", out.join(lang_ids, id_col, "left_semi"))

    if config.min_compression_ratio is not None:
        # zlib repetition gate: Arrow kernel over (id, text) only, then
        # the standard semi-join-on-ids shape.  Runs after the cheap
        # expression gates (quality/language) so the kernel sees the
        # smallest possible input.
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            compression_stats,
        )

        zs = compression_stats(out, id_col, text_col)
        z_ids = zs.filter(
            F.col("compression_ratio") >= config.min_compression_ratio
        ).select(id_col)
        out = _mark("compression", out.join(z_ids, id_col, "left_semi"))

    if config.gopher:
        # named-rule battery gate — same materialization barrier as the
        # stats table (filtering the raw projection would inline the
        # rule derivations into the pushdown'd condition)
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            gopher_quality_flags,
        )

        flags = gopher_quality_flags(out, id_col, text_col).localCheckpoint(eager=False)
        out = _mark("gopher", out.join(
            flags.filter(F.col("passes_gopher")).select(id_col), id_col, "left_semi"
        ))

    if config.gopher_repetition:
        # the repetition half of the Gopher battery (r12) — same
        # materialization barrier as the rule battery above
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            gopher_repetition_flags,
        )

        rflags = gopher_repetition_flags(
            out, id_col, text_col).localCheckpoint(eager=False)
        out = _mark("gopher_repetition", out.join(
            rflags.filter(F.col("passes_repetition")).select(id_col),
            id_col, "left_semi",
        ))

    if config.min_clf_prob is not None:
        # hashed-linear-classifier gate: one explode + broadcast weight
        # join + per-doc mean — cheaper than the LM gate, so it runs
        # first and shrinks the LM's input.  classifier_path scores a
        # PERSISTED model (classifier_write) — the production shape
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            classifier_score,
            classifier_score_from,
        )

        if config.classifier_path is not None:
            scored = classifier_score_from(
                out, config.classifier_path, id_col=id_col, text_col=text_col
            )
        elif classifier_weights is not None:
            scored = classifier_score(
                out, weights=classifier_weights, id_col=id_col, text_col=text_col,
                num_features=config.clf_num_features,
            )
        else:
            raise ValueError(
                "min_clf_prob set but neither classifier_weights nor "
                "config.classifier_path provided"
            )
        clf_ids = scored.filter(F.col("prob") >= config.min_clf_prob).select(id_col)
        out = _mark("classifier", out.join(clf_ids, id_col, "left_semi"))

    if config.max_perplexity is not None or config.keep_ppl_tiers:
        # bigram-LM gibberish gate (CCNet shape).  lm_path scores a
        # PERSISTED reference LM (lm_write) — no per-run training pass;
        # else the LM trains on lm_corpus or the gate's own survivors.
        # Both perplexity gates (absolute ceiling + relative tier keep)
        # share this one scoring pass.
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            lm_score,
            lm_score_from,
            perplexity_buckets,
        )

        bad = set(config.keep_ppl_tiers) - {"head", "middle", "tail"}
        if bad:
            raise ValueError(f"unknown ppl tiers: {sorted(bad)}")

        def _build_perplexity(out=out):
            if config.lm_path is not None:
                lm_scored = lm_score_from(
                    out, config.lm_path, id_col=id_col, text_col=text_col
                )
            else:
                lm_scored = lm_score(out, corpus=lm_corpus, id_col=id_col, text_col=text_col)
            keep = lm_scored
            if config.max_perplexity is not None:
                keep = keep.filter(F.col("perplexity") <= config.max_perplexity)
            if config.keep_ppl_tiers:
                keep = perplexity_buckets(keep, n_buckets=3, id_col=id_col).filter(
                    F.col("ppl_tier").isin(*config.keep_ppl_tiers)
                )
            return out.join(keep.select(id_col), id_col, "left_semi")

        out = _mark("perplexity", _build_perplexity)

    if config.decon_cosine is not None:
        # embedding-space eval decontamination: contaminated ids come
        # from semantic_contamination over the doc-embedding table (one
        # row per contaminated doc), then the standard id anti-join —
        # text never joins embeddings, and the eval side broadcasts in
        # both modes.  Runs after the text gates (they shrink nothing
        # here — the embedding table is keyed by id) and before dedup so
        # leaked docs never seed a cluster representative.
        if doc_embeddings is None or eval_embeddings is None:
            raise ValueError(
                "decon_cosine set but doc_embeddings/eval_embeddings not "
                "provided (the embedding tables the gate scores over)")

        def _build_decon(out=out):
            from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
                semantic_contamination,
            )

            emb_id = config.decon_id_col or id_col
            d_emb = (doc_embeddings.withColumnRenamed(emb_id, id_col)
                     if emb_id != id_col else doc_embeddings)
            e_emb = (eval_embeddings.withColumnRenamed(emb_id, id_col)
                     if emb_id != id_col else eval_embeddings)
            hits = semantic_contamination(
                d_emb, e_emb, id_col=id_col,
                threshold=config.decon_cosine, mode=config.decon_mode,
            ).select(id_col)
            return out.join(hits, id_col, "left_anti")

        out = _mark("decontaminate", _build_decon)

    out = _mark("exact_dup", lambda out=out: exact_dedup(out, id_col, text_col))

    if against_corpus is not None:
        # incremental mode: drop batch rows whose content already exists
        # in the historical corpus — Bloom broadcast probe, exact result
        from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
            dedup_against_corpus,
        )

        out = _mark("against_exact", lambda out=out: dedup_against_corpus(
            out, against_corpus, id_col=id_col, text_col=text_col,
            corpus_digest_col=config.against_digest_col,
        ))
    if config.against_sigs_path is not None:
        # incremental NEAR mode (r9): drop batch rows near-duplicating
        # history via its persisted MinHash signature store — the store
        # never shuffles (batch band table broadcast), history text
        # never re-read.  Composes with the exact mode above: exact
        # catches byte-identical re-crawls cheaply, this catches the
        # serial-token/boilerplate mutations exact misses.
        from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
            minhash_read,
            near_dedup_against_corpus,
        )

        def _build_against_near(out=out):
            store_sigs, meta = minhash_read(out.sparkSession, config.against_sigs_path)
            return near_dedup_against_corpus(
                out, corpus_sigs=store_sigs, id_col=id_col, text_col=text_col,
                num_perms=meta["num_perms"], shingle_n=meta["shingle_n"],
                seed=meta["seed"],
                num_bands=config.minhash_bands,
                rows_per_band=meta["num_perms"] // config.minhash_bands,
                verify_threshold=config.jaccard_threshold,
                # the STORE pins the signature family — mixing hash families
                # across batch and history would compare unrelated minima
                hash_fn=_HASH_FNS[meta.get("hash_name", "md5")],
            )

        out = _mark("against_near", _build_against_near)

    if config.against_embeddings_path is not None:
        # incremental SEMANTIC mode (r14): drop batch rows whose embedding
        # near-duplicates the persisted HISTORY index — the third cell of
        # the vs-history matrix (exact text / MinHash text / embedding).
        # History is touched only at its probed partitions (pruned at
        # file listing); nothing history-sized ever shuffles or re-embeds.
        if doc_embeddings is None:
            raise ValueError(
                "against_embeddings_path set but doc_embeddings not "
                "provided (the batch embedding table the gate probes with)")

        def _build_against_semantic(out=out):
            from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
                semantic_dedup_against,
            )

            emb_id = config.decon_id_col or id_col
            d_emb = (doc_embeddings.withColumnRenamed(emb_id, id_col)
                     if emb_id != id_col else doc_embeddings)
            hits = semantic_dedup_against(
                out.sparkSession, config.against_embeddings_path, d_emb,
                threshold=config.against_cosine,
                nprobe=config.against_nprobe,
                id_col="vec_id", vec_col="embedding", batch_id_col=id_col,
            ).select(id_col)
            return out.join(hits, id_col, "left_anti")

        out = _mark("against_semantic", _build_against_semantic)

    if config.survivor not in ("min_id", "quality"):
        raise ValueError(f"unknown survivor rule: {config.survivor!r}")

    # O(bucket) star-edge clustering — identical connected components to
    # the all-pairs graph (pytest-pinned in tests/test_dedup.py), output
    # linear in corpus size instead of quadratic per boilerplate bucket.
    # jaccard_threshold maps to member-vs-representative estimated-
    # Jaccard verification on the star edges.  Built behind the _mark
    # thunk so a resumed run whose near_dup boundary is already on disk
    # skips the CC edge collection entirely.
    def _build_near_dup(out=out):
        # materialization barrier: the near-dup stage consumes its input
        # TWICE (once for the MinHash signature/banding pass, once as the
        # survivor join's probe side — three times under survivor=
        # "quality"), so without this the whole upstream gate chain
        # re-executes per consumer.  Measured r10 at sf1: plain curate
        # 40.5 s -> 27.5 s cold / 15.2 s warm with the barrier (matching
        # the staged run, whose parquet boundary provides it for free;
        # BASELINE.md).  At cluster
        # scale this is the stage-boundary table write the module
        # docstring prescribes.
        out = out.localCheckpoint(eager=False)
        clusters = minhash_star_clusters(
            out, id_col, text_col,
            num_perms=config.minhash_perms, shingle_n=config.shingle_n,
            num_bands=config.minhash_bands, threshold=config.jaccard_threshold,
            seed=config.seed, hash_fn=_HASH_FNS[config.hash_fn],
        )
        if config.survivor == "quality":
            # best-member survivor: rank cluster members by the SAME
            # quality score the gate already materialized (stats is
            # checkpointed — no recompute), ties → min id.  Clustered
            # rows only enter the window; the unclustered mass never
            # sorts.
            from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
                keep_canonical_by,
            )

            scored = out.join(stats.select(id_col, "quality"), id_col)
            return keep_canonical_by(scored, clusters, "quality", id_col).drop("quality")
        return keep_canonical(out, clusters, id_col)

    return _mark("near_dup", _build_near_dup)


def curate_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CurateConfig = CurateConfig(),
    classifier_weights: DataFrame | None = None,
    lm_corpus: DataFrame | None = None,
    against_corpus: DataFrame | None = None,
    doc_embeddings: DataFrame | None = None,
    eval_embeddings: DataFrame | None = None,
    eval_corpus: DataFrame | None = None,
) -> DataFrame:
    """Per-stage drop funnel for a :func:`curate` run — the "where did my
    corpus go" report every production curation batch ships with.

    Returns one row per DROP-CAPABLE stage that ran, in pipeline order:
    ``(stage_idx, stage, rows_in, rows_out, dropped)``.  Text-rewrite
    stages (HTML extract, paragraph dedup, hot-span scrub) never drop
    rows, so ``rows_in`` of each stage equals ``rows_out`` of the
    previous one and the funnel telescopes from ``count(docs)`` down to
    the curated output size.

    Scale design: tracing wraps every stage boundary in a lazy
    ``localCheckpoint``, so counting the boundaries in pipeline order
    computes each stage ONCE (stage k's count materializes the
    checkpoint stage k+1 builds on) — auditing costs one extra count
    action per stage over a plain :func:`curate` run, not a re-run per
    stage.  The per-stage loop is driver-side but bounded by the stage
    list (≤ 12), never by data.  At cluster scale the boundaries are the
    stage-boundary table writes the module docstring prescribes, and
    this funnel is their row-count manifest.
    """
    trace: list[tuple[str, DataFrame]] = []
    curate(
        docs, id_col, text_col, config,
        classifier_weights=classifier_weights, lm_corpus=lm_corpus,
        against_corpus=against_corpus,
        doc_embeddings=doc_embeddings, eval_embeddings=eval_embeddings,
        eval_corpus=eval_corpus,
        _trace=trace,
    )
    return docs.sparkSession.createDataFrame(
        audit_rows_from_trace(docs, trace),
        "stage_idx INT, stage STRING, rows_in BIGINT, rows_out BIGINT, dropped BIGINT",
    )


def audit_rows_from_trace(
    docs: DataFrame, trace: list[tuple[str, DataFrame]]
) -> list[tuple[int, str, int, int, int]]:
    """Fold one traced :func:`curate` run into the telescoping funnel rows
    ``(stage_idx, stage, rows_in, rows_out, dropped)``.  Shared by
    :func:`curate_audit` and the CLI's ``--audit`` branch so the two
    cannot drift; counting the boundaries in pipeline order materializes
    each lazy checkpoint exactly once."""
    rows = []
    prev = docs.count()
    for i, (stage, df) in enumerate(trace, start=1):
        n = df.count()
        rows.append((i, stage, prev, n, prev - n))
        prev = n
    return rows


def dropped_from_trace(
    docs: DataFrame, id_col: str, trace: list[tuple[str, DataFrame]]
) -> DataFrame:
    """Fold one traced :func:`curate` run into the row-level drop lineage
    ``(id_col, dropped_at)``.  Shared by :func:`curate_dropped` and the
    CLI's ``--dropped-out`` branch; each stage contributes one id-only
    anti-join between consecutive boundaries (no text shuffled)."""
    prev = docs.select(id_col)
    pieces = []
    for stage, df in trace:
        cur = df.select(id_col)
        pieces.append(
            prev.join(cur, id_col, "left_anti")
            .withColumn("dropped_at", F.lit(stage))
        )
        prev = cur
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def curate_dropped(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CurateConfig = CurateConfig(),
    classifier_weights: DataFrame | None = None,
    lm_corpus: DataFrame | None = None,
    against_corpus: DataFrame | None = None,
    doc_embeddings: DataFrame | None = None,
    eval_embeddings: DataFrame | None = None,
    eval_corpus: DataFrame | None = None,
) -> DataFrame:
    """Row-level drop lineage — the per-document complement of
    :func:`curate_audit`: one ``(id_col, dropped_at)`` row for every
    document the pipeline dropped, labeled with the stage that dropped
    it.  Survivors don't appear.  This answers the support question a
    funnel can't: "why is doc X missing from the release?"

    Scale: same traced run as the audit (each boundary computes once
    behind its lazy checkpoint); each stage contributes one id-only
    anti-join between consecutive boundaries — narrow (id) columns, no
    text shuffled.  The union is linear in DROPPED rows, not corpus
    size.
    """
    trace: list[tuple[str, DataFrame]] = []
    curate(
        docs, id_col, text_col, config,
        classifier_weights=classifier_weights, lm_corpus=lm_corpus,
        against_corpus=against_corpus,
        doc_embeddings=doc_embeddings, eval_embeddings=eval_embeddings,
        eval_corpus=eval_corpus,
        _trace=trace,
    )
    return dropped_from_trace(docs, id_col, trace)


_HASH_FNS = {"md5": md5_long, "xxhash": xxhash60}
