package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is pure column expressions (whole-stage codegen, pushdown
  * friendly); nothing collects or loops on the driver. At 100 TB these run
  * as one narrow map pass over the corpus.
  */
object TextAnalysis {

  /** Small built-in stopword lists per language for the n-gram/stopword
    * language-ID heuristic (the classic "function words" approach). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une", "que", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "de", "un", "una", "que", "no"),
    "it" -> Seq("il", "la", "di", "e", "che", "un", "una", "per", "non", "sono"),
    "nl" -> Seq("de", "het", "een", "en", "van", "is", "dat", "niet", "met", "te"))

  /** Whitespace tokens. trim() first: Java split keeps the empty token a
    * LEADING separator produces (and a trailing one via limit -1), which
    * would inflate counts and deflate mean word length. */
  def tokens(textCol: Column): Column = split(trim(lower(textCol)), "\\s+")

  private def langScores(textCol: Column, langs: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.LangScoresExpr(E(textCol), langs.map(stopwords)))
  }

  /** Fraction of tokens that are stopwords of `lang` — native single-pass
    * kernel (bit-identical to the filter-HOF formulation, ~10x faster). */
  def stopwordRatio(textCol: Column, lang: String): Column =
    coalesce(element_at(langScores(textCol, Seq(lang)), 1), lit(0.0))

  /** Language ID: argmax of per-language stopword ratios; 'und' when no
    * list scores above `minScore`. One kernel pass scores ALL languages.
    * Deterministic tie-break by language code order. */
  def langId(textCol: Column, langs: Seq[String] = Seq("en", "de", "fr", "es", "it", "nl"),
             minScore: Double = 0.02): Column = {
    require(langs.nonEmpty, "langId needs at least one language")
    val unknown = langs.filterNot(stopwords.contains)
    require(unknown.isEmpty,
      s"no stopword list for: ${unknown.mkString(", ")} (have ${stopwords.keys.toSeq.sorted.mkString(", ")})")
    val scores = langScores(textCol, langs)
    val scored = langs.zipWithIndex.map { case (l, i) =>
      struct(element_at(scores, i + 1).as("score"), lit(l).as("lang")) }
    // struct comparison is lexicographic (score, then lang): ties on score
    // resolve to the alphabetically-largest language code — deterministic
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    when(best.getField("score") >= minScore, best.getField("lang")).otherwise(lit("und"))
  }

  /** `[nTokensWs, sumTokenLens, nBpe, punctCount, rawChars, digitCount, upperCount]` in one native
    * codegen pass ([[graft.functions.TextStatsExpr]]) — the length/shape
    * twin of [[tokenStats]]. Every scalar below derives from it;
    * whole-stage codegen's subexpression elimination computes it once per
    * row however many are selected together. */
  def textStats(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.TextStatsExpr(E(textCol)))
  }

  /** Whitespace token count. */
  def tokenCountWs(textCol: Column): Column =
    element_at(textStats(textCol), 1).cast("int")

  /** Non-empty whitespace token count — the split-edge-proof twin of
    * [[tokenCountWs]] (never counts the empty edge tokens Java split /
    * `string_split_regex` emit for leading/trailing whitespace), for
    * cross-engine-comparable reports. */
  def tokenCountWsNonEmpty(textCol: Column): Column =
    element_at(textStats(textCol), 8).cast("int")

  /** BPE-ish token count: runs of letters, runs of digits, single other
    * non-space chars — a cheap proxy for subword-tokenizer counts.
    * Counted over `toLowerCase`d text (engine-owned case mapping); the
    * cross-engine report family uses [[tokenCountBpeCaseless]] instead. */
  def tokenCountBpe(textCol: Column): Column =
    element_at(textStats(textCol), 3).cast("int")

  /** Per-code-point class counts + CASELESS token counts in one native
    * codegen pass over the ORIGINAL text
    * ([[graft.functions.ClassCountsExpr]] — no case mapping anywhere, so
    * no JVM-locale / ICU / utf8proc sensitivity). Slot layout documented
    * on the expression. */
  def classCounts(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.ClassCountsExpr(E(textCol)))
  }

  /** Non-empty whitespace token count, caseless kernel. Value-identical to
    * [[tokenCountWsNonEmpty]] (whitespace membership is case-invariant). */
  def tokenCountWsCaseless(textCol: Column): Column =
    element_at(classCounts(textCol), 15)

  /** BPE-ish token count with NO case mapping: runs of `[A-Za-z]` (one
    * class — "FooBar" is one token), runs of digits, every other non-ws
    * code point its own token. The engine-portable twin of
    * [[tokenCountBpe]]: identical on caseless text, and on mixed-case text
    * it never consults a case-mapping table either engine could disagree
    * on. */
  def tokenCountBpeCaseless(textCol: Column): Column =
    element_at(classCounts(textCol), 16)

  /** Exact cross-engine ratio with 9 decimals: round-half-up of
    * `num/den * 1e9` computed in INTEGER arithmetic
    * (`(2*num*1e9 + den) div (2*den)`), then presented as DECIMAL(18,9) by
    * an exact decimal multiply — no double division, no `round(double, n)`
    * (whose half-way behavior and result repr are engine-owned) anywhere.
    * Inputs are widened to DECIMAL(38,0) first so the `2e9 *` numerator
    * survives group-level counts far beyond long range (1e13 tokens/group
    * at the 100 TB end → 2e22, well inside 38 digits).
    *
    * The OUTPUT precision is deliberately 18, not 20: precision ≤ 18
    * decimals are int64-backed in both engines (DuckDB int64, Spark
    * parquet int64 physical), while precision > 18 flips both to a
    * 128-bit representation (DuckDB HUGEINT storage, parquet
    * FIXED_LEN_BYTE_ARRAY) — the repr class the r12/r13 driver-hash
    * adjudications convicted for `sum()` HUGEINT and the r13 residual
    * red family. All consumers are RATIOS (value < 1e9), so 9+9 digits
    * hold every reachable value exactly; exactness is unchanged, only
    * the storage tier narrows to the proven-green one. */
  def ratioDecimal9(num: Column, den: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    (ratioE9(num, den).cast(DecimalType(20, 0)) *
      lit(new java.math.BigDecimal("0.000000001")).cast(DecimalType(10, 9)))
      .cast(DecimalType(18, 9))
  }

  /** The shared integer core of [[ratioDecimal9]]/[[ratioDouble9]]: the
    * 9-decimal ratio as a plain LONG of scaled units (round-half-up of
    * `num/den * 1e9` in integer arithmetic; 0 when `den <= 0`). */
  private def ratioE9(num: Column, den: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.types.DecimalType
    val n38 = num.cast(DecimalType(38, 0))
    val d38 = den.cast(DecimalType(38, 0))
    when(den > 0,
      C(IntegralDivide(E(n38 * lit(2000000000L) + d38), E(d38 * lit(2L)))))
      .otherwise(lit(0L))
  }

  /** The same exact 9-decimal ratio presented as DOUBLE: `e9 / 1e9` where
    * `e9` is [[ratioE9]]'s integer. The r15 adjudication of the residual
    * driver-hash red family (q_fertility / q_pad_waste / q_text_scripts /
    * q_diag_dec_narrow) showed that EVERY scale-9 DECIMAL output column —
    * int64-backed (18,9) exactly like int128-backed (20,9) — hash-diverges
    * on the driver's compare path while the values are equal (sf0.01
    * value-level replay exact, parquet physical INT64, rows/schema green),
    * so the r13 "precision <= 18 is the green tier" theory was incomplete:
    * the only repeatedly-proven-green presentation tiers are BIGINT and
    * DOUBLE (hundreds of green queries + the data-independent
    * q_diag_dbl_* probes). This presents the identical integer-derived
    * value in the proven tier: `CAST(e9 AS DOUBLE)` is exact for
    * e9 < 2^53 (ratios up to ~9e6, far beyond any reachable
    * tokens-per-word / ratio-of-counts value at 100 TB) and `/ 1e9` is one
    * correctly-rounded IEEE-754 binary64 division both engines perform
    * identically — no engine-owned `round(double, n)` anywhere. */
  def ratioDouble9(num: Column, den: Column): Column =
    ratioE9(num, den).cast("double") / lit(1e9)

  /** Quality score components + weighted aggregate, following the usual
    * heuristic-filter recipe (length, punctuation density, stopword
    * density, mean word length). All engine-portable arithmetic. */
  def punctRatio(textCol: Column): Column = {
    val ts = textStats(textCol)
    ratio(element_at(ts, 4), element_at(ts, 5))
  }

  def meanWordLength(textCol: Column): Column = {
    val ts = textStats(textCol)
    ratio(element_at(ts, 2), element_at(ts, 1))
  }

  /** Fraction of characters that are ASCII digits — same semantics as
    * `(len - len(regexp_replace(t, '[0-9]', ''))) / len`, but counted in
    * the one-pass `text_stats` kernel (differential-pinned). */
  def digitRatio(textCol: Column): Column = {
    val ts = textStats(textCol)
    ratio(element_at(ts, 6), element_at(ts, 5))
  }

  /** Fraction of characters that are ASCII uppercase (`[A-Z]`), from the
    * same kernel pass. */
  def upperRatio(textCol: Column): Column = {
    val ts = textStats(textCol)
    ratio(element_at(ts, 7), element_at(ts, 5))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with
    * English-like stopword density, penalizes punctuation soup. */
  def qualityScore(textCol: Column): Column = {
    val lenScore = least(length(textCol).cast("double") / 1000.0, lit(1.0))
    val swScore = least(stopwordRatio(textCol, "en") * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(textCol) * 5.0)
    (lenScore * 0.4 + swScore * 0.3 + punctPenalty * 0.3)
  }

  // ===== repetition signals (Gopher-style filters, Rae et al. 2021) =====

  /** `[nTokens, nDistinct, maxTokenFreq, nBigrams, nDistinctBigrams,
    * maxBigramFreq]` in one native codegen pass ([[graft.functions.TokenStatsExpr]]).
    * Whole-stage codegen's subexpression elimination computes this ONCE per
    * row even when several ratio columns below are derived from it. */
  def tokenStats(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.TokenStatsExpr(E(textCol)))
  }

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0)

  /** Fraction of tokens that repeat an earlier token: `1 - distinct/total`.
    * High values flag boilerplate / keyword-stuffed documents. */
  def dupTokenRatio(textCol: Column): Column = {
    val ts = tokenStats(textCol)
    ratio(element_at(ts, 1) - element_at(ts, 2), element_at(ts, 1))
  }

  /** Fraction of all tokens taken by the single most frequent token. */
  def topTokenFraction(textCol: Column): Column = {
    val ts = tokenStats(textCol)
    ratio(element_at(ts, 3), element_at(ts, 1))
  }

  /** Fraction of word bigrams that repeat an earlier bigram — catches
    * looping/templated text that token-level stats miss. */
  def dupBigramRatio(textCol: Column): Column = {
    val ts = tokenStats(textCol)
    ratio(element_at(ts, 4) - element_at(ts, 5), element_at(ts, 4))
  }

  /** Fraction of lines that duplicate an earlier line (C4/Gopher duplicate-
    * line filter). One native pass ([[graft.functions.SegmentDupStatsExpr]]):
    * split semantics keep trailing empties (limit -1) so blank-line runs
    * count as duplicates too, exactly like the
    * `split`/`array_distinct` formulation it replaced (PropertySpec). */
  def duplicateLineFraction(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    val st = C(graft.functions.SegmentDupStatsExpr(E(textCol), '\n'))
    ratio(element_at(st, 1) - element_at(st, 2), element_at(st, 1))
  }

  /** CORPUS-level boilerplate removal (the C4 recipe, Raffel et al. 2020):
    * drop every line that occurs verbatim in at least `minDocs` distinct
    * documents — navigation chrome, cookie banners, license footers — and
    * reassemble each document from its surviving lines in order.
    *
    * Scale shape: lines explode narrowly; the cross-corpus frequency count
    * groups on the line TEXT — exactness over an 8-byte hash key, whose
    * 64-bit collisions would silently delete innocent lines corpus-wide at
    * billions of distinct lines — with map-side partial aggregation
    * collapsing per-partition repeats before the shuffle, so the shuffle
    * carries each distinct line once per partition, not once per
    * occurrence. The boilerplate set anti-joins back (broadcast when
    * small, shuffle when not). Reassembly buffers one DOCUMENT per
    * aggregation buffer — bounded by document size, never by corpus or
    * group size. Documents whose every line is boilerplate come back as
    * the empty string, not dropped. A null id is rejected at runtime: all
    * null-id documents would otherwise merge into ONE reconstruction group
    * (and a join back to them cannot distinguish rows), silently
    * destroying their text. */
  /** Out-of-vocabulary rate: per document, the fraction of its token
    * OCCURRENCES outside the corpus's `topK` most frequent tokens — the
    * CCNet-style rarity/quality signal that needs no external language
    * model (high OOV = gibberish/rare-script text; near-zero OOV =
    * boilerplate). Ties at the vocabulary boundary break on the token
    * string, so the vocabulary — and hence every rate — is deterministic
    * and external-engine-reproducible.
    *
    * Plan shape: one token-frequency aggregate (partial map-side combine,
    * then an 8-byte-hash-keyed shuffle), a TakeOrdered top-K for the
    * vocabulary (per-partition heaps, no global sort), then a broadcast
    * LEFT join of the exploded corpus against the K-row vocabulary and a
    * per-document re-aggregate. The corpus is scanned twice (once for the
    * vocabulary, once for scoring) — at 100 TB persist the vocabulary
    * like the similarity indexes if it is reused across runs. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              topK: Int = 10000, out: String = "oov_rate"): DataFrame = {
    require(topK > 0, s"topK must be > 0, got $topK")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val vocab = toks.groupBy("__tok").agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__tok").asc).limit(topK)
      .select(col("__tok"), lit(true).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(idCol)
      .agg(((count(lit(1)) - count(col("__in_vocab"))).cast("double") /
        count(lit(1))).as(out))
  }

  /** Unigram language-model score: per document, the mean negative log
    * likelihood of its tokens under a unigram model trained on `trainOn`
    * (default: the corpus itself) — the CCNet/perplexity-style quality
    * signal without an external LM. Low NLL = common, fluent-ish tokens;
    * high NLL = rare-token/gibberish text. Filter or bucket on it the way
    * CCNet buckets on wikipedia-LM perplexity. With an external `trainOn`
    * corpus, tokens unseen in training are EXCLUDED from the mean (their
    * model probability is zero; pair with [[oovRate]], which measures
    * exactly that mass) — self-trained scoring has no unseen tokens.
    *
    * Determinism across engines: per-token `-ln(count/total)` is rounded
    * into a DECIMAL(28,12) before summation, so the per-document sum is
    * EXACT (no float summation-order drift — the dsum recipe), and the
    * final mean is rounded to 6 decimals, orders of magnitude coarser
    * than the ~1-ulp cross-engine `ln` disagreement the decimal carries.
    *
    * Plan shape: one token-frequency aggregate over the training corpus
    * (map-side partial combine), its 1-row total broadcast-cross-joined,
    * a token-keyed join back to the exploded corpus, one per-document
    * re-aggregate. Nothing collects; the model IS a distributed table —
    * at 100 TB persist the (token, count) table like the similarity
    * indexes if it is reused across runs. */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
              trainOn: Option[DataFrame] = None,
              out: String = "nll"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def toks(d: DataFrame) = d.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val counts = toks(trainOn.getOrElse(df))
      .groupBy("__tok").agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__t"))
    val nllTok = (-log(col("__c").cast("double") / col("__t")))
      .cast(DecimalType(28, 12))
    toks(df).join(counts, Seq("__tok"))
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(round(sum(nllTok).cast("double") / count(lit(1)), 6).as(out))
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * self-trained unigram LM ([[lmScore]]), cut the corpus at the exact
    * interpolated tercile thresholds of the NLL distribution, and tag
    * each document `head` (lowest NLL — most fluent), `middle`, or
    * `tail` — the bucket-by-LM-quality move CCNet applies before choosing
    * which slice to train on. Cuts are VALUE thresholds (≤ tercile), so
    * threshold ties land deterministically in the lower bucket on any
    * engine; bucket sizes are therefore within the tie-class of n/3
    * rather than forced-equal (a rank-exact split would need a global
    * row_number — a single-partition sort at 100 TB; the value-threshold
    * form needs only the two-pass bracket quantile).
    *
    * Scale shape: lmScore's passes + one BracketMedian.exactQuantiles
    * (bounded-memory bracket sketch, exact within bracket) + a broadcast
    * 1-row threshold join — nothing corpus-sized on the driver. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        out: String = "bucket"): DataFrame = {
    val scored = lmScore(df, idCol, textCol)
    val th = graft.ops.BracketMedian.exactQuantiles(
        scored.withColumn("__g", lit(1)), Seq("__g"), "nll",
        Seq("__q0" -> 1.0 / 3, "__q1" -> 2.0 / 3))
      .drop("__g")
    scored.crossJoin(broadcast(th))
      .withColumn(out,
        when(col("nll") <= col("__q0"), "head")
          .when(col("nll") <= col("__q1"), "middle")
          .otherwise("tail"))
      .drop("__q0", "__q1")
  }

  /** Sentence-start marker for [[lmScoreBigram]]: a control-char prefix a
    * whitespace tokenizer can essentially never produce. */
  private val BigramStart = "\u0001s"

  /** BIGRAM language-model score: per document, the mean negative log
    * likelihood of its tokens under an add-k-smoothed bigram model
    * trained on `trainOn` (default: the corpus itself) — the next step up
    * from [[lmScore]] toward CCNet's n-gram perplexity filter: a unigram
    * model scores "rare words", a bigram model also scores "words in
    * impossible orders" (shuffled text, keyword stuffing, boilerplate
    * soup score high NLL even when every token is common).
    *
    * Model: `P(w_i | w_{i-1}) = (c2 + k) / (c1 + k·V)` with `c2` the
    * bigram count, `c1 = Σ_cur c2(prev, ·)` the context count, `V` the
    * training vocabulary size; the first token conditions on a sentence
    * marker. Pairs unseen in an external training corpus fall back to the
    * smoothed floor `k/(k·V)` — finite, never minus-infinity.
    *
    * Determinism across engines: the [[lmScore]] recipe — each bigram's
    * `-ln P` rounds into DECIMAL(28,12) before the exact per-document
    * sum; the final mean rounds to 6 decimals, far coarser than the
    * ~1-ulp cross-engine `ln` drift.
    *
    * Plan shape: bigrams derive from the token ARRAY by zipping it with
    * its own shift — no per-document window, no second shuffle; then one
    * bigram-count aggregate (map-side combined), a model-sized context
    * re-aggregate, a 1-row vocabulary broadcast, a bigram-keyed join back
    * and one per-document re-aggregate. The model IS a distributed
    * (prev, cur, count) table — persist it at 100 TB when reused. */
  def lmScoreBigram(df: DataFrame, idCol: String, textCol: String,
                    trainOn: Option[DataFrame] = None, addK: Double = 0.5,
                    out: String = "nll2"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(addK > 0, s"addK must be > 0, got $addK")
    def bigrams(d: DataFrame) = {
      val ws = tokens(col(textCol))
      val prevs = concat(array(lit(BigramStart)),
        slice(ws, lit(1), greatest(size(ws) - 1, lit(0))))
      d.select(col(idCol),
          explode(zip_with(prevs, ws, (a, b) =>
            struct(a.as("p"), b.as("c")))).as("__b"))
        .select(col(idCol), col("__b.p").as("__prev"), col("__b.c").as("__cur"))
    }
    val train = bigrams(trainOn.getOrElse(df))
    val c2 = train.groupBy("__prev", "__cur").agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy("__prev").agg(sum(col("__c2")).as("__c1"))
    val vocab = train.agg(count_distinct(col("__cur")).as("__v"))
    val p = (coalesce(col("__c2"), lit(0L)).cast("double") + lit(addK)) /
      (coalesce(col("__c1"), lit(0L)).cast("double") + lit(addK) * col("__v").cast("double"))
    val nllTok = (-log(p)).cast(DecimalType(28, 12))
    bigrams(df)
      .join(c2, Seq("__prev", "__cur"), "left")
      .join(c1, Seq("__prev"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(round(sum(nllTok).cast("double") / count(lit(1)), 6).as(out))
  }

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — the bag-of-words
    * unigram form): per document, the mean per-token log-ratio
    * `ln p_target(tok) − ln p_corpus(tok)` between a TARGET-domain sample
    * model and the corpus model. High weight = reads like the target
    * domain; feed it to [[graft.pipeline.Sampling.keepTopFraction]] or a
    * softmax resampler to select in-domain training data.
    *
    * Both unigram models are Laplace-smoothed over the UNION vocabulary
    * (`(c+1)/(T+V)`), so target-unseen tokens contribute a finite penalty
    * instead of vanishing (the reference point that makes the ratio
    * well-defined for every corpus token).
    *
    * Determinism across engines: the [[lmScore]] recipe — each token's
    * log-ratio rounds into DECIMAL(28,12) before the exact sum; the final
    * mean rounds to 6 decimals, far coarser than cross-engine `ln` ulp
    * drift.
    *
    * Plan shape: two token-frequency aggregates (map-side combined), one
    * full-outer vocab join (model-sized, not corpus-sized), a 1-row
    * totals broadcast, a token-keyed join back to the exploded corpus,
    * one per-document re-aggregate. The models ARE distributed tables —
    * persist the (token, count) tables at 100 TB when reused. */
  def importanceWeight(df: DataFrame, idCol: String, textCol: String,
                       target: DataFrame, targetTextCol: String,
                       out: String = "logratio"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def tokCounts(d: DataFrame, tc: String, as: String) =
      d.select(explode(tokens(col(tc))).as("__tok"))
        .groupBy("__tok").agg(count(lit(1)).as(as))
    val ct = tokCounts(target, targetTextCol, "__ct")
    val cc = tokCounts(df, textCol, "__cc")
    val vocab = cc.join(ct, Seq("__tok"), "full_outer")
    val sizes = vocab.agg(count(lit(1)).as("__v"),
      sum(coalesce(col("__ct"), lit(0L))).as("__tt"),
      sum(coalesce(col("__cc"), lit(0L))).as("__tc"))
    val ratioTok =
      (log((coalesce(col("__ct"), lit(0L)).cast("double") + 1.0) / (col("__tt") + col("__v")))
        - log((coalesce(col("__cc"), lit(0L)).cast("double") + 1.0) / (col("__tc") + col("__v"))))
        .cast(DecimalType(28, 12))
    df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .join(vocab, Seq("__tok"))
      .crossJoin(broadcast(sizes))
      .groupBy(idCol)
      .agg(round(sum(ratioTok).cast("double") / count(lit(1)), 6).as(out))
  }

  /** Top-`k` salient terms per document, ranked by term frequency over
    * document frequency (tf/df — tf·idf with the linear idf variant
    * `N/df`; the ranking is identical for any fixed document, and the
    * integer-derived ratio is bit-reproducible across engines, which a
    * log-based idf is not). Ties break on the term string, so the output
    * is fully deterministic.
    *
    * Output: (id, term_rank, term, tf, df) — `k` rows per document (fewer
    * for documents with under `k` distinct terms).
    *
    * Plan shape: tf is one (id, term)-keyed aggregate with map-side
    * partial combine; df re-aggregates the tf table (already one row per
    * (doc, term)) by term — document frequency without a distinct. The
    * join back is term-keyed; the per-document top-k is a rank window
    * partitioned by document id, which Spark executes as WindowGroupLimit
    * (partial per-partition top-k before the shuffle). Nothing global,
    * nothing collected. */
  def salientTerms(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("term_rank"), col("term"), col("tf"), col("df"))
  }

  /** Corpus diversity report: pairwise VOCABULARY Jaccard between groups
    * (sources, languages, shards) — "how much does src3 overlap src7?".
    * All-integer until the final division, so the result is exact and
    * engine-portable. Scale shape: one distinct on (group, token), one
    * aggregate to per-token group-sets (bounded by the group count, not
    * the corpus), pair explode ≤ C(groups,2) per token absorbed by
    * map-side combine, and a broadcast-size join against per-group
    * vocabulary counts. Nothing is ever quadratic in tokens — only in
    * GROUPS, which is the point of a per-group report. Pairs with zero
    * shared vocabulary do not appear (nothing joins them). */
  /** Zipf rank-frequency fit: least-squares slope/intercept/r² of
    * `ln(freq) ~ ln(rank)` over the corpus's `topN` most frequent tokens —
    * the classic corpus-health gauge (natural text sits near slope −1;
    * boilerplate-heavy or templated corpora flatten, spam steepens).
    * Frequency ties rank deterministically by token, and the moments ride
    * the exact-decimal [[graft.functions.WarpAggregates]] bivariate
    * recipe, so the single-row report replays exactly in SQL.
    *
    * Scale shape: one token explode + map-side-combined count (vocab-
    * bounded), a TakeOrdered(topN) cut, then a rank window and the moment
    * aggregate over topN rows — the only single-partition stage is
    * topN-sized by construction. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    require(topN > 1, s"need topN > 1 ranks to fit, got $topN")
    val counts = df
      .select(explode(tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0)
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    val top = counts.orderBy(col("__c").desc, col("__t")).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c").desc, col("__t"))
    val pts = top.withColumn("__r", row_number().over(w))
      .select(log(col("__r").cast("double")).as("__x"),
        log(col("__c").cast("double")).as("__y"))
    pts.agg(count(lit(1)).as("n_ranks"),
      graft.functions.WarpAggregates.warpSlope(col("__x"), col("__y"))
        .as("slope"),
      graft.functions.WarpAggregates.warpIntercept(col("__x"), col("__y"))
        .as("intercept"),
      graft.functions.WarpAggregates.warpR2(col("__x"), col("__y"))
        .as("r2"))
  }

  def vocabOverlap(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val vocab = df.select(col(groupCol).as("__g"),
      explode(tokens(col(textCol))).as("__tok")).distinct()
    val sizes = vocab.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val gs = col("__gs")
    val pairCol = flatten(transform(gs, (a, i) =>
      transform(slice(gs, i + lit(2), size(gs) - i - lit(1)),
        b => struct(a.as("ga"), b.as("gb")))))
    val inter = vocab.groupBy(col("__tok"))
      .agg(sort_array(collect_set(col("__g"))).as("__gs"))
      .select(explode(pairCol).as("__p"))
      .groupBy(col("__p.ga").as("group_a"), col("__p.gb").as("group_b"))
      .agg(count(lit(1)).as("inter"))
    val sa = sizes.toDF("__ga", "__na"); val sb = sizes.toDF("__gb", "__nb")
    inter.join(broadcast(sa), col("group_a") === col("__ga"))
      .join(broadcast(sb), col("group_b") === col("__gb"))
      .withColumn("uni", col("__na") + col("__nb") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .select("group_a", "group_b", "inter", "uni", "jaccard")
  }

  /** Per-source unigram divergence from the corpus: for each group,
    * `KL(p_group ‖ p_corpus) = Σ_t p_g(t)·ln(p_g(t)/p_c(t))` over the
    * group's (lowercased, whitespace-split, empty-dropped) token
    * distribution — the mixture-design read ("how far does src7 sit from
    * the blend?") that pairs with Sampling.temperatureMix: high-KL
    * sources are the ones a temperature flatten will visibly reweight.
    * Also emits `n_tokens` and `vocab` per group. KL ≥ 0, and 0 only for
    * a group matching the corpus distribution exactly; every group token
    * is corpus-supported by construction, so no zero-denominator terms.
    *
    * Determinism: each addend `p_g·ln ratio` rounds into DECIMAL(28,12)
    * before the per-group sum (the dsum recipe — exact, order-invariant),
    * and the reported divergence rounds to 6 decimals, far coarser than
    * cross-engine `ln` ulp drift.
    *
    * Plan shape at 100 TB: one token explode (linear flatMap) feeding a
    * map-side-combined (group, token) count; corpus counts re-aggregate
    * from THAT table (vocab-sized, not corpus-sized); per-group totals
    * broadcast. The only corpus-sized pass is the explode itself. */
  def sourceDivergence(df: DataFrame, groupCol: String, textCol: String,
                       out: String = "kl"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val gt = df.select(col(groupCol).as("__g"),
        explode(tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .groupBy(col("__g"), col("__tok"))
      .agg(count(lit(1)).as("__cg"))
    val corpus = gt.groupBy(col("__tok")).agg(sum(col("__cg")).as("__cc"))
    val gTotals = gt.groupBy(col("__g")).agg(sum(col("__cg")).as("__ng"),
      count(lit(1)).as("__vg"))
    val cTotal = corpus.agg(sum(col("__cc")).as("__nc"))
    val pg = col("__cg").cast("double") / col("__ng")
    // ratio in doubles: integer products would overflow LONG once both
    // factors pass ~3e9 (count × corpus-total at real corpus sizes)
    val ratio = (col("__cg").cast("double") * col("__nc").cast("double")) /
      (col("__cc").cast("double") * col("__ng").cast("double"))
    val addend = (pg * log(ratio)).cast(DecimalType(28, 12))
    gt.join(corpus, Seq("__tok"))
      .join(broadcast(gTotals), Seq("__g"))
      .crossJoin(broadcast(cTotal))
      .groupBy(col("__g").as(groupCol))
      .agg(first(col("__ng")).as("n_tokens"), first(col("__vg")).as("vocab"),
        round(sum(addend).cast("double"), 6).as(out))
  }

  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                             minDocs: Long = 2, out: String = "clean_text"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    removeBoilerplateCore(df, idCol, textCol,
      counts => counts.filter(col("__docs") >= minDocs), out)
  }

  /** [[removeBoilerplateLines]] with the threshold as a FRACTION of the
    * corpus ("drop lines occurring in >= frac of documents", the C4
    * formulation). The corpus size is computed INSIDE the plan — a 1-row
    * count aggregate broadcast-cross-joined onto the line frequencies — so
    * building the query runs no job and the corpus is scanned once, not
    * twice (a driver-side `df.count()` at plan-build time would be a full
    * extra scan at 100 TB). Clamped to at least 2 distinct documents so a
    * tiny corpus never declares every line boilerplate. */
  def removeBoilerplateLinesByFrac(df: DataFrame, idCol: String, textCol: String,
                                   minDocFrac: Double, out: String = "clean_text"): DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0,
      s"minDocFrac must be in (0,1], got $minDocFrac")
    val totals = df.agg(count(lit(1)).as("__total"))
    removeBoilerplateCore(df, idCol, textCol,
      counts => counts.crossJoin(broadcast(totals)).filter(
        col("__docs") >= greatest(lit(2L),
          ceil(lit(minDocFrac) * col("__total")).cast("long"))), out)
  }

  private def removeBoilerplateCore(df: DataFrame, idCol: String, textCol: String,
                                    selectBad: DataFrame => DataFrame,
                                    out: String): DataFrame = {
    val guardedId = when(col(idCol).isNotNull, col(idCol))
      .otherwise(raise_error(lit(s"removeBoilerplateLines: null $idCol")))
    val lines = df.select(guardedId.as("__id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos", "__line")))
    val bad = selectBad(
      lines.groupBy("__line").agg(count_distinct(col("__id")).as("__docs")))
      .select("__line")
    val rebuilt = lines.join(bad, Seq("__line"), "left_anti")
      .groupBy("__id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line")), "\n").as("__rebuilt"))
    // scratch name sidesteps ambiguity when df already has an `out` column
    df.join(rebuilt, df(idCol) === rebuilt("__id"), "left")
      .drop("__id")
      .withColumn(out, coalesce(col("__rebuilt"), lit("")))
      .drop("__rebuilt")
  }

  // ===== PII detection / redaction =====
  // Patterns are deliberately conservative ASCII regexes that parse
  // identically under Java regex (Spark) and RE2 (DuckDB/engines) — the
  // point is engine-portable counts, not maximal recall.

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\+\\d{7,15}"

  /** All PII signals in one native pass ([[graft.functions.PiiScanExpr]]):
    * `struct<emails, ips, phones, redacted>`. The scalar accessors below
    * share one kernel call per row via codegen subexpression elimination;
    * each field is differentially pinned against the regex formulation
    * (PropertySpec). */
  def piiScan(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.PiiScanExpr(E(textCol)))
  }

  def piiEmailCount(textCol: Column): Column = piiScan(textCol).getField("emails")
  def piiIpv4Count(textCol: Column): Column = piiScan(textCol).getField("ips")
  def piiPhoneCount(textCol: Column): Column = piiScan(textCol).getField("phones")

  /** Replace emails, then IPv4 addresses, then international-format phone
    * numbers with typed placeholder tags. Order matters: the email pattern
    * would otherwise leave its host part for the IP pattern to re-match. */
  def redactPii(textCol: Column): Column = piiScan(textCol).getField("redacted")

  /** Canonical Unicode normalization ([[graft.functions.NormalizeExpr]]):
    * `form` is NFC/NFKC/NFD/NFKD. Already-normalized rows (ASCII fast
    * path) return the input buffer untouched — on a mostly-ASCII corpus
    * this is a scan, not a rewrite. */
  def normalizeUnicode(textCol: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.NormalizeExpr(E(textCol), form))
  }

  /** Repair latin-1/windows-1252 mojibake
    * ([[graft.functions.UnicodeText.fixMojibake]]): all-or-nothing
    * re-decode gated on strict UTF-8 validity, so legitimate accented
    * text never false-repairs. */
  def fixMojibake(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.FixMojibakeExpr(E(textCol)))
  }

  /** Tokenizer-fertility report per corpus slice: whitespace-token and
    * BPE-ish-token totals with their ratio ("subword tokens per word") —
    * the per-source/per-language cost signal that drives mixture and
    * budget decisions (a high-fertility slice burns more of a fixed token
    * budget per word of content). Exact and engine-portable end-to-end:
    * counts come from the CASELESS kernel ([[classCounts]] — no
    * case-mapping table on either engine's path), the word denominator is
    * the NON-EMPTY token count (immune to any engine's empty-edge-token
    * split behavior), and the ratio is the integer-derived 9-decimal value
    * presented as DOUBLE ([[ratioDouble9]] — no `round(double, n)` whose
    * half-way behavior and repr are engine-owned; DOUBLE because every
    * scale-9 DECIMAL presentation is driver-hash red, see [[ratioDouble9]]).
    * One map pass (both counts ride the one
    * kernel call) + one map-side-combined aggregate, grouped by the
    * (small) slice keys.
    *
    * One construct serves every fertility consumer (the report itself and
    * the mixture-reweight cost signal); the pre-r12 `legacyDouble` path —
    * lowered-text counts + `round(double, 9)` — was deleted in r14 once
    * its last consumer (`q_mixture_reweight`) migrated here. */
  def fertilityReport(df: DataFrame, groupCols: Seq[String],
                      textCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("docs"),
        sum(tokenCountWsCaseless(col(textCol))).as("ws_tokens"),
        sum(tokenCountBpeCaseless(col(textCol))).as("bpe_tokens"))
      .withColumn("fertility",
        ratioDouble9(col("bpe_tokens"), col("ws_tokens")))

  /** Per-slice SCRIPT/character-class report — the script-mix curation
    * stage (mixed-script spam and mislabeled-language slices show up as
    * off-profile class ratios). Character classes are EXPLICIT code-point
    * ranges (never a property class like \p{L}, whose membership differs
    * across regex engines — and since r12 never a regex at all: counts
    * come from the [[classCounts]] kernel's per-code-point range tests,
    * the exact construct the DuckDB oracle replays with `unicode(c)
    * BETWEEN lo AND hi`): ASCII letters, ASCII digits, Cyrillic
    * U+0400-04FF, Greek U+0370-03FF, CJK unified U+4E00-9FFF; `other` is
    * the remainder after also removing the explicit Java-\s whitespace
    * class. All integer totals; the ratio is the integer-derived 9-decimal
    * value presented as DOUBLE ([[ratioDouble9]]). One map pass +
    * map-side-combined aggregate — scales as a pure scan. */
  def scriptReport(df: DataFrame, groupCols: Seq[String],
                   textCol: String): DataFrame = {
    val cc = classCounts(col(textCol))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("docs"),
        sum(element_at(cc, 1)).as("chars"),
        sum(element_at(cc, 2)).as("latin"),
        sum(element_at(cc, 4)).as("digit"),
        sum(element_at(cc, 12)).as("cyrillic"),
        sum(element_at(cc, 13)).as("greek"),
        sum(element_at(cc, 14)).as("cjk"),
        sum(element_at(cc, 5)).as("whitespace"))
      .withColumn("other",
        col("chars") - col("latin") - col("digit") - col("cyrillic") -
          col("greek") - col("cjk") - col("whitespace"))
      .withColumn("latin_ratio", ratioDouble9(col("latin"), col("chars")))
  }

  /** Content fingerprint: MD5 of whitespace-normalized lowercase text —
    * engine-portable (identical in any SQL engine with md5()). */
  def fingerprintMd5(textCol: Column): Column =
    md5(to_binary(regexp_replace(trim(lower(textCol)), "\\s+", " "), lit("utf-8")))

  /** 64-bit rolling-style fingerprint (xxhash64 of normalized text) for
    * compact dedup keys. */
  def fingerprint64(textCol: Column): Column =
    xxhash64(regexp_replace(trim(lower(textCol)), "\\s+", " "))
}
