package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Expression, ExpressionInfo, FromUTCTimestamp, If, LastDay, Literal, ParseUrl, RegExpExtract, ToUTCTimestamp}
import org.apache.spark.sql.types.{LongType, StringType}

/** The engine's function registry (≈ the reference's
  * `metadata/SystemFunctionBundle.java:350`, which assembles 460
  * @ScalarFunction declarations): native Catalyst expressions and
  * custom aggregates are injected through [[SparkSessionExtensions]]
  * (Spark's public plugin point), and pure-Scala gap-fill scalars are
  * registered as session UDFs.
  *
  * Native (codegen) expressions — hot-path, stay inside whole-stage
  * codegen: cosine_similarity, simhash64, qdigest_agg /
  * value_at_quantile, approx_most_frequent.
  *
  * UDF gap-fill (reference file in parens): word_stem
  * (WordStemFunction.java), lang_id (capability-add for the LLM
  * pipeline), ngrams (ArrayFunctions ngrams), wilson_interval_lower/
  * upper (WilsonInterval.java), url_encode/url_decode
  * (UrlFunctions.java), ip_prefix_contains (IpAddressFunctions.java),
  * luhn_check (LuhnCheckFunction.java). UDFs don't codegen, so they
  * are reserved for low-volume columns; anything on the 100 TB hot
  * path gets a native expression instead.
  */
object GraftFunctions {

  // ---------------------------------------------------------- injection
  def inject(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => WordNGrams(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    e.injectFunction((
      FunctionIdentifier("qdigest_agg"),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "qdigest_agg"),
      // reference overloads (QuantileDigestAggregationFunction.java):
      // (v), (v, weight), (v, weight, accuracy) — accuracy must fold
      (children: Seq[Expression]) => children match {
        case Seq(v) => QuantileSketchAgg(v)
        case Seq(v, w) => QuantileSketchAgg(v, weight = Some(w))
        case Seq(v, w, acc) =>
          require(acc.foldable, "qdigest_agg accuracy must be a constant")
          val a = acc.eval() match {
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case n: Number => n.doubleValue()
          }
          QuantileSketchAgg(v, alpha = a, weight = Some(w))
        case _ => throw new IllegalArgumentException(
          "qdigest_agg takes 1-3 arguments")
      }))
    e.injectFunction((
      FunctionIdentifier("tz_wall"),
      new ExpressionInfo(classOf[TzWall].getName, "tz_wall"),
      (children: Seq[Expression]) => TzWall(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("tz_to_utc"),
      new ExpressionInfo(classOf[TzToUtc].getName, "tz_to_utc"),
      (children: Seq[Expression]) => TzToUtc(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("tz_iso8601"),
      new ExpressionInfo(classOf[TzIso8601].getName, "tz_iso8601"),
      (children: Seq[Expression]) => TzIso8601(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("u_trim"),
      new ExpressionInfo(classOf[UTrimBoth].getName, "u_trim"),
      (children: Seq[Expression]) => UTrimBoth(children.head)))
    e.injectFunction((
      FunctionIdentifier("u_ltrim"),
      new ExpressionInfo(classOf[UTrimLeft].getName, "u_ltrim"),
      (children: Seq[Expression]) => UTrimLeft(children.head)))
    e.injectFunction((
      FunctionIdentifier("u_rtrim"),
      new ExpressionInfo(classOf[UTrimRight].getName, "u_rtrim"),
      (children: Seq[Expression]) => UTrimRight(children.head)))
    e.injectFunction((
      FunctionIdentifier("spooky_hash_v2_32"),
      new ExpressionInfo(classOf[SpookyHashV232].getName, "spooky_hash_v2_32"),
      (children: Seq[Expression]) => SpookyHashV232(children.head)))
    e.injectFunction((
      FunctionIdentifier("spooky_hash_v2_64"),
      new ExpressionInfo(classOf[SpookyHashV264].getName, "spooky_hash_v2_64"),
      (children: Seq[Expression]) => SpookyHashV264(children.head)))
    e.injectFunction((
      FunctionIdentifier("value_at_quantile"),
      new ExpressionInfo(classOf[ValueAtQuantile].getName, "value_at_quantile"),
      (children: Seq[Expression]) => ValueAtQuantile(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("quantile_at_value"),
      new ExpressionInfo(classOf[QuantileAtValue].getName, "quantile_at_value"),
      (children: Seq[Expression]) => QuantileAtValue(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("values_at_quantiles"),
      new ExpressionInfo(classOf[ValuesAtQuantiles].getName, "values_at_quantiles"),
      (children: Seq[Expression]) => ValuesAtQuantiles(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("tdigest_agg"),
      new ExpressionInfo(classOf[TDigestAgg].getName, "tdigest_agg"),
      (children: Seq[Expression]) =>
        if (children.length > 1) TDigestAgg(children.head, weight = Some(children(1)))
        else TDigestAgg(children.head)))
    e.injectFunction((
      FunctionIdentifier("trimmed_mean"),
      new ExpressionInfo(classOf[TrimmedMean].getName, "trimmed_mean"),
      (children: Seq[Expression]) =>
        TrimmedMean(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("approx_most_frequent"),
      new ExpressionInfo(classOf[ApproxMostFrequentAgg].getName, "approx_most_frequent"),
      (children: Seq[Expression]) => ApproxMostFrequentAgg(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("numeric_histogram"),
      new ExpressionInfo(classOf[NumericHistogramAgg].getName, "numeric_histogram"),
      (children: Seq[Expression]) => NumericHistogramAgg(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("map_union"),
      new ExpressionInfo(classOf[MapUnionAgg].getName, "map_union"),
      (children: Seq[Expression]) => MapUnionAgg(children.head)))
    e.injectFunction((
      FunctionIdentifier("multimap_agg"),
      new ExpressionInfo(classOf[MultimapAgg].getName, "multimap_agg"),
      (children: Seq[Expression]) => MultimapAgg(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("merge"),
      new ExpressionInfo(classOf[MergeSketchAgg].getName, "merge"),
      (children: Seq[Expression]) => MergeSketchAgg(children.head)))
    e.injectFunction((
      FunctionIdentifier("media_probe"),
      new ExpressionInfo(classOf[MediaProbe].getName, "media_probe"),
      (children: Seq[Expression]) => MediaProbe(children.head)))
    e.injectFunction((
      FunctionIdentifier("audio_probe"),
      new ExpressionInfo(classOf[AudioProbe].getName, "audio_probe"),
      (children: Seq[Expression]) => AudioProbe(children.head)))
    e.injectFunction((
      FunctionIdentifier("token_weight_sum"),
      new ExpressionInfo(classOf[TokenWeightSum].getName, "token_weight_sum"),
      (children: Seq[Expression]) => TokenWeightSum(children.head)))
    // reference-contract skewness/kurtosis (CentralMoments.scala):
    // the dialect renames reference-SQL spellings onto these; Spark's
    // builtins stay untouched for DataFrame users
    e.injectFunction((
      FunctionIdentifier("graft_skewness"),
      new ExpressionInfo(classOf[CentralMomentsAgg].getName, "graft_skewness"),
      (children: Seq[Expression]) =>
        CentralMomentsAgg(children.head, isKurtosis = false)))
    e.injectFunction((
      FunctionIdentifier("graft_kurtosis"),
      new ExpressionInfo(classOf[CentralMomentsAgg].getName, "graft_kurtosis"),
      (children: Seq[Expression]) =>
        CentralMomentsAgg(children.head, isKurtosis = true)))
    // reference map_from_entries raises on NULL entries/keys and
    // DUPLICATE keys (MapFromEntriesFunction.java) — the session's
    // LAST_WIN dedup policy (map_concat's last-map-wins contract)
    // would otherwise silently keep the last value
    e.injectFunction((
      FunctionIdentifier("map_from_entries"),
      new ExpressionInfo(classOf[CheckUniqueKeys].getName, "map_from_entries"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.MapFromEntries(
          CheckUniqueKeys(children.head))))
    e.injectFunction((
      FunctionIdentifier("min_by_n"),
      new ExpressionInfo(classOf[MinByN].getName, "min_by_n"),
      (children: Seq[Expression]) =>
        MinByN(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("max_by_n"),
      new ExpressionInfo(classOf[MaxByN].getName, "max_by_n"),
      (children: Seq[Expression]) =>
        MaxByN(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("exact_quantiles"),
      new ExpressionInfo(classOf[ExactQuantiles].getName, "exact_quantiles"),
      (children: Seq[Expression]) => ExactQuantiles(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("kmv_set_digest"),
      new ExpressionInfo(classOf[KmvDigestAgg].getName, "kmv_set_digest"),
      (children: Seq[Expression]) => KmvDigestAgg(children.head)))
    e.injectFunction((
      FunctionIdentifier("jaccard_index"),
      new ExpressionInfo(classOf[JaccardIndex].getName, "jaccard_index"),
      (children: Seq[Expression]) => JaccardIndex(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("intersection_cardinality"),
      new ExpressionInfo(classOf[IntersectionCardinality].getName, "intersection_cardinality"),
      (children: Seq[Expression]) => IntersectionCardinality(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_date_add"),
      new ExpressionInfo(classOf[TrinoDateAdd].getName, "graft_date_add"),
      (children: Seq[Expression]) => TrinoDateAdd(children(0), children(1), children(2))))
    // at_timezone / with_timezone (reference `scalar/timestamptz/
    // AtTimeZone.java:30`, `WithTimeZone.java`): Spark's timestamp is
    // an instant with no carried zone id (SURVEY §1.3 documents the
    // loss), so the zone-preserving half degrades to the local-clock
    // shift — at_timezone(ts, tz) renders the instant on tz's wall
    // clock (≡ from_utc_timestamp under the UTC session), and
    // with_timezone(ts, tz) reads a wall-clock ts as tz local time and
    // returns the instant (≡ to_utc_timestamp). Both are Catalyst
    // codegen expressions, not UDFs.
    e.injectFunction((
      FunctionIdentifier("at_timezone"),
      new ExpressionInfo(classOf[FromUTCTimestamp].getName, "at_timezone"),
      (children: Seq[Expression]) => FromUTCTimestamp(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("with_timezone"),
      new ExpressionInfo(classOf[ToUTCTimestamp].getName, "with_timezone"),
      (children: Seq[Expression]) => ToUTCTimestamp(children(0), children(1))))
    // url_extract_* family: registered as UDFs over java.net.URI in
    // registerUdfs — the reference's contract (UrlFunctions.java:182
    // `slice(nullToEmpty(...))`) distinguishes INVALID URL (every
    // extractor NULL) from ABSENT component (empty string), which
    // Catalyst's ParseUrl cannot express (it returns NULL for both).
    // duration family (reference `scalar/DateTimeFunctions.java`
    // to_milliseconds / `ParseDurationFunction`) + last_day_of_month
    // as a name-alias of Spark's codegen LastDay (same semantics).
    e.injectFunction((
      FunctionIdentifier("parse_duration"),
      new ExpressionInfo(classOf[ParseDuration].getName, "parse_duration"),
      (children: Seq[Expression]) => ParseDuration(children.head)))
    e.injectFunction((
      FunctionIdentifier("to_milliseconds"),
      new ExpressionInfo(classOf[ToMilliseconds].getName, "to_milliseconds"),
      (children: Seq[Expression]) => ToMilliseconds(children.head)))
    e.injectFunction((
      FunctionIdentifier("last_day_of_month"),
      new ExpressionInfo(classOf[LastDay].getName, "last_day_of_month"),
      (children: Seq[Expression]) => LastDay(children.head)))
    e.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (children: Seq[Expression]) =>
        RollingFingerprint(children(0), children(1), children(2))))
    // console-rendering color family (reference ColorFunctions.java;
    // COLOR type maps to BIGINT — see ConsoleColor.scala)
    e.injectFunction((
      FunctionIdentifier("color"),
      new ExpressionInfo(classOf[ColorFn].getName, "color"),
      (children: Seq[Expression]) => ColorFn(children)))
    e.injectFunction((
      FunctionIdentifier("rgb"),
      new ExpressionInfo(classOf[RgbFn].getName, "rgb"),
      (children: Seq[Expression]) => RgbFn(children)))
    e.injectFunction((
      FunctionIdentifier("bar"),
      new ExpressionInfo(classOf[BarFn].getName, "bar"),
      (children: Seq[Expression]) => BarFn(children)))
    e.injectFunction((
      FunctionIdentifier("render"),
      new ExpressionInfo(classOf[RenderFn].getName, "render"),
      (children: Seq[Expression]) => RenderFn(children)))
    e.injectFunction((
      FunctionIdentifier("word_stem"),
      new ExpressionInfo(classOf[WordStem].getName, "word_stem"),
      (children: Seq[Expression]) => WordStem(children)))
    e.injectFunction((
      FunctionIdentifier("contains_sequence"),
      new ExpressionInfo(classOf[ContainsSequence].getName, "contains_sequence"),
      (children: Seq[Expression]) => ContainsSequence(children(0), children(1))))
    // typeof: OVERRIDES Spark's builtin of the same name — renders
    // the reference dialect's type names (integer/varchar/row(...)),
    // not Spark's (int/string/struct<...>); folds to a literal
    e.injectFunction((
      FunctionIdentifier("typeof"),
      new ExpressionInfo(classOf[TrinoTypeOf].getName, "typeof"),
      (children: Seq[Expression]) => TrinoTypeOf(children.head)))
    // exact-name compatibility pack (r13 registry audit)
    CompatAliases.inject(e)
    // optimizer extension surface (Rule[LogicalPlan])
    // One FUSED resolution rule carries all reference-semantics
    // rewrites (subscripts, IEEE division, NaN-aware min/max, map
    // grouping keys): the resolution batch iterates to a fixed point,
    // so every separately-injected rule is a full tree scan per
    // iteration per query — measured ~10% of bench wall-clock when
    // these were five rules.
    e.injectResolutionRule(_ => graft.plans.GraftResolutionRules)
    // IeeeDoubleDivide ALSO runs in the Hints batch, which fires
    // BEFORE the Resolution batch's ResolveInlineTables evaluates
    // VALUES rows (all-literal divisions are already resolved there —
    // without this, `VALUES (0E0/0E0)` dies on ANSI DIVIDE_BY_ZERO
    // before any resolution rule sees it).
    e.injectHintResolutionRule(_ => graft.plans.IeeeDoubleDivide)
    // fail-loud guard for Spark's wrong-result decorrelation of
    // GROUP BY + LIMIT correlated subqueries (CorrelatedLimitGuard)
    e.injectCheckRule(_ => graft.plans.CorrelatedLimitGuard)
    e.injectOptimizerRule(_ => graft.plans.IdempotentCollectionOps)
    e.injectOptimizerRule(_ => graft.plans.ConstantIndexElementAt)
  }

  // --------------------------------------------------------- UDF layer
  def registerUdfs(spark: SparkSession): Unit = {
    CompatAliases.registerUdfs(spark)
    // version() (reference VersionFunction.java — returns the node
    // version; ours reports the engine + Spark runtime version)
    spark.udf.register("version",
      () => s"graft (spark ${org.apache.spark.SPARK_VERSION})")
    // word_stem moved to an injected expression (2-arg language form;
    // see functions/ArrayConformance.scala WordStem)
    spark.udf.register("lang_id", (s: String) => langId(s))
    spark.udf.register("ngrams",
      (words: Seq[String], n: Int) => ngrams(words, n))
    spark.udf.register("wilson_interval_lower",
      (pos: Long, n: Long, z: Double) => wilsonLower(pos, n, z))
    spark.udf.register("wilson_interval_upper",
      (pos: Long, n: Long, z: Double) => wilsonUpper(pos, n, z))
    spark.udf.register("url_encode", (s: String) => urlEncode(s))
    spark.udf.register("url_decode", (s: String) => urlDecode(s))
    // url_extract_* (reference UrlFunctions.java): invalid URL → NULL
    // for every extractor; a VALID url with an absent component → ''
    // (port: absent → NULL). java.net.URI is the same parser the
    // reference delegates to.
    spark.udf.register("url_extract_protocol",
      (u: String) => urlComponent(u, "protocol"))
    spark.udf.register("url_extract_host",
      (u: String) => urlComponent(u, "host"))
    spark.udf.register("url_extract_path",
      (u: String) => urlComponent(u, "path"))
    spark.udf.register("url_extract_query",
      (u: String) => urlComponent(u, "query"))
    spark.udf.register("url_extract_fragment",
      (u: String) => urlComponent(u, "fragment"))
    spark.udf.register("url_extract_port", (u: String) => urlPort(u))
    spark.udf.register("url_extract_parameter",
      (u: String, k: String) => urlParameter(u, k))
    spark.udf.register("ip_prefix_contains",
      (cidr: String, ip: String) => ipPrefixContains(cidr, ip))
    // string-emulated UUID / IPADDRESS casts (UuidIpCompat;
    // Dialect castAsUuidIpPass routes CAST/TRY_CAST/typed literals)
    spark.udf.register("graft_uuid",
      (s: String) => UuidIpCompat.uuidCanon(s))
    spark.udf.register("graft_uuid_try",
      (s: String) => UuidIpCompat.uuidCanonOrNull(s))
    spark.udf.register("graft_uuid_bin",
      (b: Array[Byte]) => UuidIpCompat.uuidFromBytes(b))
    spark.udf.register("graft_ipaddress",
      (s: String) => UuidIpCompat.ipCanon(s))
    spark.udf.register("graft_ipaddress_try",
      (s: String) => UuidIpCompat.ipCanonOrNull(s))
    spark.udf.register("graft_ipaddress_bin",
      (b: Array[Byte]) => UuidIpCompat.ipFromBytes(b))
    // value-form VARBINARY casts: CAST(uuid/ip AS VARBINARY) yields
    // the 16-byte value, not the text bytes (TestUuidOperators /
    // TestIpAddressOperators varbinary rows)
    spark.udf.register("graft_uuid_to_bin",
      (s: String) => UuidIpCompat.uuidBytes(s))
    spark.udf.register("graft_ipaddress_to_bin",
      (s: String) => UuidIpCompat.ipBytesOrNullIn(s))
    // LISTAGG ON OVERFLOW finishing kernel over the ordered-agg array
    // (ListaggOverflow; Dialect lowers the ON OVERFLOW clause onto it)
    spark.udf.register("graft_listagg_finish",
      (arr: Seq[String], sep: String, isError: Boolean, filler: String,
        withCount: Boolean) =>
        ListaggOverflow.finish(arr, sep, isError, filler, withCount))
    // NOTE: luhn_check is NOT registered — Spark 4 ships a codegen'd
    // builtin of the same name/semantics; luhnCheck below stays as the
    // documented reference implementation (unit-tested).
    spark.udf.register("normalize", (s: String, f: String) => normalizeStr(s, f))
    spark.udf.register("hamming_distance",
      (a: String, b: String) => hammingDistance(a, b))
    spark.udf.register("combinations",
      (a: Seq[String], n: Int) => combinations(a, n))
    // contains_sequence moved to an injected generic expression
    // (functions/ArrayConformance.scala ContainsSequence)
    spark.udf.register("split_to_multimap",
      (s: String, ed: String, kd: String) => splitToMultimap(s, ed, kd))
    spark.udf.register("format_number", (v: Double) => formatNumber(v))
    spark.udf.register("parse_data_size", (s: String) => parseDataSize(s))
    // legacy spelling kept by the reference for compatibility
    spark.udf.register("parse_presto_data_size", (s: String) => parseDataSize(s))
    spark.udf.register("human_readable_seconds",
      (d: Double) => humanReadableSeconds(d))
    spark.udf.register("hmac_sha256",
      (data: Array[Byte], key: Array[Byte]) => hmacSha256(data, key))
    spark.udf.register("to_base32", (b: Array[Byte]) => toBase32(b))
    spark.udf.register("from_base32", (s: String) => fromBase32(s))
    spark.udf.register("normal_cdf",
      (m: Double, sd: Double, x: Double) => StatFunctions.normalCdf(m, sd, x))
    spark.udf.register("inverse_normal_cdf",
      (m: Double, sd: Double, p: Double) => StatFunctions.inverseNormalCdf(m, sd, p))
    spark.udf.register("beta_cdf",
      (a: Double, b: Double, x: Double) => StatFunctions.betaCdf(a, b, x))
    spark.udf.register("inverse_beta_cdf",
      (a: Double, b: Double, p: Double) => StatFunctions.inverseBetaCdf(a, b, p))
    spark.udf.register("json_size", (j: String, path: String) => jsonSize(j, path))
    spark.udf.register("json_parse", (s: String) => jsonParse(s))
    spark.udf.register("json_format", (s: String) => jsonParse(s))
    spark.udf.register("json_exists",
      (j: String, path: String) => jsonExists(j, path))
    spark.udf.register("json_value",
      (j: String, path: String) => jsonValue(j, path))
    spark.udf.register("json_query",
      (j: String, path: String) => jsonQuery(j, path))
    // SQL/JSON 2016 clause forms (PASSING / DEFAULT ... ON EMPTY|ERROR
    // / wrappers): status-struct variants the dialect's
    // sqlJsonClausePass lowers onto — status 0 ok, 1 empty, 2 error;
    // the ON EMPTY / ON ERROR behaviors become CASE arms over status,
    // so defaults stay arbitrary SQL expressions. `vars` carries the
    // PASSING bindings as JSON-fragment text; a NULL map value is the
    // NULL FORMAT JSON empty-sequence binding.
    spark.udf.register("graft_json_value_x",
      (j: String, path: String, vars: Map[String, String]) =>
        jsonValueX(j, path, vars))
    spark.udf.register("graft_json_query_x",
      (j: String, path: String, vars: Map[String, String],
       wrapper: Int, omitQuotes: Boolean) =>
        jsonQueryX(j, path, vars, wrapper, omitQuotes))
    spark.udf.register("graft_json_exists_x",
      (j: String, path: String, vars: Map[String, String]) =>
        jsonExistsX(j, path, vars))
    // SQL/JSON constructor support (reference TestJsonObject/
    // TestJsonArrayFunction): FORMAT JSON values re-parse through
    // Jackson — validates (malformed raises the reference's
    // conversion error), minifies, and collapses duplicate object
    // keys; encode/decode cover UTF-32, which Spark's own
    // encode()/decode() reject.
    // current_groups() (reference TestSessionFunctions): the session
    // identity carries no groups here — constant empty array, like the
    // reference's groups-less identity
    spark.udf.register("current_groups", () => Seq.empty[String])
    spark.udf.register("graft_json_norm", (s: String) => jsonNorm(s))
    spark.udf.register("graft_encode",
      (s: String, cs: String) =>
        if (s == null) null
        else s.getBytes(java.nio.charset.Charset.forName(cs)))
    spark.udf.register("graft_decode",
      (b: Array[Byte], cs: String) =>
        if (b == null) null
        else new String(b, java.nio.charset.Charset.forName(cs)))
    DateTimeCompat.register(spark)
  }

  // ------------------------------------------------------ implementations

  /** Porter stemmer, original 1980 rules — see [[PorterStemmer]].
    * The reference's WordStemFunction wraps Snowball's EnglishStemmer
    * (Porter2), whose rules diverge on some words (e.g. Porter2 stems
    * "faithfulness"→"faith" where Porter1 yields "faithful"), and also
    * accepts a language argument; this implementation is English-only
    * Porter1, documented as such. */
  def wordStem(s: String): String = PorterStemmer.stem(s)

  private val stopProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"),
    "es" -> Set("el", "los", "las", "y", "es", "un", "una", "que", "por", "para"))

  /** Heuristic language ID: CJK codepoint share for zh, stop-word
    * profile votes for the latin-script languages, "und" when no
    * signal. Deterministic, pure function of the text. */
  def langId(s: String): String = {
    if (s == null || s.isEmpty) return "und"
    val cjk = s.codePoints().toArray.count(cp =>
      (cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf))
    if (cjk * 5 >= s.length) return "zh"
    val words = s.toLowerCase.split("\\s+").toSeq
    val scores = stopProfiles.view.mapValues(p => words.count(p.contains)).toMap
    val (bestLang, bestScore) = scores.toSeq.sortBy { case (l, c) => (-c, l) }.head
    if (bestScore == 0) "und" else bestLang
  }

  /** ngrams(array, n) → array(array) (reference
    * TestArrayNgramsFunction): n must be positive; n past the array
    * length yields ONE n-gram holding the whole array. */
  def ngrams(words: Seq[String], n: Int): Seq[Seq[String]] = {
    if (words == null) return null
    if (n < 1) throw new IllegalArgumentException("N must be positive")
    if (words.length <= n) Seq(words)
    else words.sliding(n).map(_.toSeq).toSeq
  }

  /** Wilson score interval (public formula; reference
    * `operator/scalar/WilsonInterval.java`). */
  def wilsonLower(pos: Long, n: Long, z: Double): Double = wilson(pos, n, z, -1)
  def wilsonUpper(pos: Long, n: Long, z: Double): Double = wilson(pos, n, z, 1)

  private def wilson(pos: Long, n: Long, z: Double, dir: Int): Double = {
    if (n == 0) return Double.NaN
    val p = pos.toDouble / n
    val z2 = z * z
    val v = (p + z2 / (2 * n) + dir * z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))) /
      (1 + z2 / n)
    // clamp: a proportion interval lives in [0,1]; the raw formula can
    // stray by one ulp at p∈{0,1}
    math.min(1.0, math.max(0.0, v))
  }

  /** Form encoding (the reference's url_encode delegates to Guava's
    * urlFormParameterEscaper: space → '+', '~' → %7E, "-_.*" kept —
    * byte-identical to java.net.URLEncoder; TestUrlFunctions
    * testUrlEncode pins '~@:.-*_+ ☃' → '%7E%40%3A.-*_%2B+%E2%98%83'). */
  def urlEncode(s: String): String =
    if (s == null) null
    else java.net.URLEncoder.encode(s, "UTF-8")

  /** Form decoding ('+' is a space), like the reference's decodeUrl →
    * java URLDecoder delegation. */
  def urlDecode(s: String): String =
    if (s == null) null
    else java.net.URLDecoder.decode(s, "UTF-8")

  /** url_extract_* core (reference UrlFunctions.java): java.net.URI
    * parse; invalid → NULL, absent component → '' (nullToEmpty). */
  private def parseUri(url: String): java.net.URI =
    if (url == null) null
    else try new java.net.URI(url)
    catch { case _: java.net.URISyntaxException => null }

  def urlComponent(url: String, part: String): String = {
    val uri = parseUri(url)
    if (uri == null) return null
    val v = part match {
      case "protocol" => uri.getScheme
      case "host"     => uri.getHost
      case "path"     => uri.getPath
      case "query"    => uri.getQuery
      case "fragment" => uri.getFragment
    }
    if (v == null) "" else v
  }

  def urlPort(url: String): java.lang.Long = {
    val uri = parseUri(url)
    if (uri == null || uri.getPort < 0) null
    else java.lang.Long.valueOf(uri.getPort.toLong)
  }

  /** First query arg whose key matches: value decoded; a bare key
    * (no '=') yields ''; no match / no query → NULL. */
  def urlParameter(url: String, name: String): String = {
    val uri = parseUri(url)
    if (uri == null || uri.getRawQuery == null || name == null) return null
    uri.getRawQuery.split("&", -1).foreach { arg =>
      val kv = arg.split("=", 2)
      if (kv(0) == name) return if (kv.length > 1) urlDecode(kv(1)) else ""
    }
    null
  }

  /** IPv4 CIDR containment (reference IpAddressFunctions contains). */
  def ipPrefixContains(cidr: String, ip: String): Boolean = {
    def toBits(a: String): Long =
      a.split('.').foldLeft(0L)((acc, o) => (acc << 8) | o.toInt)
    val Array(base, lenS) = cidr.split('/')
    val len = lenS.toInt
    val mask = if (len == 0) 0L else (-1L << (32 - len)) & 0xffffffffL
    (toBits(base) & mask) == (toBits(ip) & mask)
  }

  /** Unicode normalization (reference StringFunctions normalize(s,
    * form)): NFC/NFD/NFKC/NFKD via java.text.Normalizer. */
  def normalizeStr(s: String, form: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.valueOf(form.toUpperCase))

  /** Positions at which two equal-length strings differ (reference
    * StringFunctions hamming_distance; BMP text — counts UTF-16 units,
    * identical to codepoint counting for the fixture corpus). Boxed
    * return: Spark passes NULL string args through to the UDF, and a
    * primitive Long return would make the column non-nullable — the
    * boxed null is what propagates NULL to the result. */
  def hammingDistance(a: String, b: String): java.lang.Long = {
    if (a == null || b == null) return null
    require(a.length == b.length, "the input strings must have the same length")
    var n = 0L
    var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) n += 1; i += 1 }
    Long.box(n)
  }

  /** n-element subsequences in COLEXICOGRAPHIC index order — ordered
    * by greatest member index, recursively (reference
    * ArrayCombinationsFunction.java's enumeration order, pinned by
    * TestArrayCombinationsFunction: [bar,foo,baz,foo] choose 2 →
    * (0,1),(0,2),(1,2),(0,3),(1,3),(2,3)). Unlike Scala's
    * `.combinations`, duplicate VALUES produce duplicate
    * subsequences — index-based, matching the reference. Argument
    * contract mirrored: size ∈ [0, 5], total result elements ≤
    * 100 000 ("combinations exceed max size"). */
  def combinations(a: Seq[String], n: Int): Seq[Seq[String]] = {
    if (a == null) return null
    require(n >= 0, s"combination size must not be negative: $n")
    require(n <= 5, s"combination size must not exceed 5: $n")
    val count = (0 until n).foldLeft(1L)((acc, i) =>
      math.min(100001L, acc * (a.length - i) / (i + 1)))
    require(count * n <= 100000L, "combinations exceed max size")
    // colex: every combination of [0..m-1] choose k-1, then append m
    def go(k: Int, bound: Int): Seq[List[Int]] =
      if (k == 0) Seq(Nil)
      else (k - 1 until bound).flatMap(m => go(k - 1, m).map(_ :+ m))
    go(n, a.length).map(_.map(a).toSeq)
  }

  private val sizeUnits = Seq("B" -> 0, "kB" -> 1, "MB" -> 2, "GB" -> 3,
    "TB" -> 4, "PB" -> 5, "EB" -> 6).toMap

  /** '2.3MB' → 2411725 bytes (reference DataSizeFunctions
    * parse_data_size: binary units, round half up). Boxed return so a
    * NULL input yields NULL (see [[hammingDistance]]). */
  /** contains_sequence (reference `operator/scalar/ArrayContainsSequence
    * .java`): true iff `seq` occurs in `arr` as a CONTIGUOUS
    * subsequence (an empty sequence is always contained). */
  def containsSequence(arr: Seq[String], seq: Seq[String]): java.lang.Boolean = {
    if (arr == null || seq == null) return null
    seq.isEmpty ||
      (0 to arr.length - seq.length).exists(i => arr.slice(i, i + seq.length) == seq)
  }

  /** split_to_multimap (reference `operator/scalar/
    * SplitToMultimapFunction.java`): split `s` on `entryDelim`, each
    * entry on `kvDelim`, keeping every value per key in encounter
    * order (unlike split_to_map, which requires unique keys).
    * Reference contracts mirrored exactly: the key-value delimiter
    * must appear EXACTLY once per entry
    * (SplitToMultimapFunction.java:84-86 throws on 'k=v=w'), a single
    * trailing entry delimiter is tolerated ('a=1;' → {a:[1]} — the
    * scan stops at string end), delimiters must be non-empty and
    * distinct. */
  def splitToMultimap(s: String, entryDelim: String,
      kvDelim: String): Map[String, Seq[String]] = {
    if (s == null || entryDelim == null || kvDelim == null) return null
    require(entryDelim.nonEmpty, "entryDelimiter is empty")
    require(kvDelim.nonEmpty, "keyValueDelimiter is empty")
    require(entryDelim != kvDelim,
      "entryDelimiter and keyValueDelimiter must not be the same")
    if (s.isEmpty) return Map.empty
    val raw = s.split(java.util.regex.Pattern.quote(entryDelim), -1)
    val entries = // trailing delimiter: no empty last entry materializes
      if (raw.last.isEmpty) raw.init.toSeq else raw.toSeq
    val pairs = entries.map { e =>
      val parts = e.split(java.util.regex.Pattern.quote(kvDelim), -1)
      require(parts.length == 2,
        s"Key-value delimiter must appear exactly once in each entry. Bad input: '$e'")
      (parts(0), parts(1))
    }
    // groupBy loses encounter order of KEYS; rebuild it explicitly so
    // the map iterates deterministically (matters for to_json output)
    val grouped = pairs.groupBy(_._1)
    pairs.map(_._1).distinct.map(k => k -> grouped(k).map(_._2)).toMap
  }

  /** format_number (reference `operator/scalar/FormatNumberFunction
    * .java`): humanize with K/M/B/T/Q unit suffixes via
    * DecimalFormat("#.##"/"#.#"/"#") with HALF_UP — exactly the
    * reference's formatter, which rounds on the EXACT binary double
    * (so 12350 → "12.3K" because 12350/1000 is really 12.34999…, and
    * 1005 → "1K" because 1.005 is really 1.00499…; a shortest-decimal
    * BigDecimal.valueOf round would give 12.4K/1.01K — wrong). Other
    * quirks mirrored: the digit-count choice tests `value < 10`, not
    * |value| (so every negative gets the 2-decimal format), and
    * 999_950..999_999 round to "1000K", not "1M". Shadows Spark's
    * 2-arg comma-grouping builtin of the same name — the reference
    * dialect's 1-arg form wins in our registry (same policy as
    * url_decode). */
  /** The reference's double/real/decimal overloads CAST TO LONG first
    * (FormatNumberFunction.java `format((long) value)`), so one
    * double-typed UDF serves every numeric input with the reference's
    * exact truncation (DOUBLE '1234.5' → "1.23K" via 1234). */
  def formatNumber(value: Double): String = formatNumber(value.toLong)

  def formatNumber(value: Long): String = {
    var fractional = value.toDouble
    var unit = ""
    for (u <- Seq("K", "M", "B", "T", "Q"))
      if (fractional >= 1000 || fractional <= -1000) { fractional /= 1000; unit = u }
    val pattern = if (fractional < 10) "#.##" else if (fractional < 100) "#.#" else "#"
    val df = new java.text.DecimalFormat(pattern,
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT))
    df.setRoundingMode(java.math.RoundingMode.HALF_UP)
    df.format(fractional) + unit
  }

  def parseDataSize(s: String): java.lang.Long = {
    if (s == null) return null
    val m = "^(\\d+(?:\\.\\d+)?)\\s*([A-Za-z]+)$".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"Invalid data size: '$s'"))
    val pow = sizeUnits.getOrElse(m.group(2),
      throw new IllegalArgumentException(s"Invalid data size unit: '${m.group(2)}'"))
    // truncate toward zero (reference DataSizeFunctions: '2.2kB' →
    // 2252, not 2253)
    (BigDecimal(m.group(1)) * BigDecimal(1024).pow(pow))
      .setScale(0, BigDecimal.RoundingMode.DOWN).longValue
  }

  /** 694861 → "1 week, 1 day, 1 hour, 1 minute, 1 second" (reference
    * DateTimeFunctions human_readable_seconds: nonzero units only,
    * pluralized, comma-joined; all-zero → "0 seconds"). */
  def humanReadableSeconds(d: Double): String = {
    require(!d.isNaN && !d.isInfinity, "Invalid argument found: NaN or Infinity")
    var n = math.rint(math.abs(d)).toLong
    val units = Seq(604800L -> "week", 86400L -> "day", 3600L -> "hour",
      60L -> "minute", 1L -> "second")
    val parts = units.flatMap { case (secs, name) =>
      val q = n / secs
      n %= secs
      if (q > 0) Some(s"$q $name" + (if (q > 1) "s" else "")) else None
    }
    if (parts.isEmpty) "0 seconds" else parts.mkString(", ")
  }

  /** HMAC-SHA256 (reference HmacFunctions.java) via javax.crypto. */
  def hmacSha256(data: Array[Byte], key: Array[Byte]): Array[Byte] = {
    if (data == null || key == null) return null
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 base32 encode (reference VarbinaryFunctions
    * to_base32). */
  def toBase32(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val sb = new StringBuilder
    var bits = 0
    var acc = 0L
    for (b <- bytes) {
      acc = (acc << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb += B32(((acc >> bits) & 31).toInt)
      }
    }
    if (bits > 0) sb += B32(((acc << (5 - bits)) & 31).toInt)
    while (sb.length % 8 != 0) sb += '='
    sb.toString
  }

  /** RFC 4648 base32 decode. */
  def fromBase32(s: String): Array[Byte] = {
    if (s == null) return null
    val in = s.takeWhile(_ != '=')
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    var bits = 0
    var acc = 0L
    for (c <- in) {
      val v = B32.indexOf(c.toUpper)
      require(v >= 0, s"invalid base32 character '$c'")
      acc = (acc << 5) | v
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out += ((acc >> bits) & 0xff).toByte
      }
    }
    out.toArray
  }

  // readTree is thread-safe; one shared mapper avoids per-row allocation
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // Legacy-path trio (json_extract / json_extract_scalar / json_size)
  // tolerates trailing commas: the reference's extractor is a
  // STREAMING parse that stops at the match (JsonExtract.java), so a
  // trailing comma after it never surfaces; a tree parse must opt in.
  private val legacyJsonMapper = {
    val b = new com.fasterxml.jackson.core.JsonFactoryBuilder()
    b.enable(com.fasterxml.jackson.core.json.JsonReadFeature.ALLOW_TRAILING_COMMA)
    new com.fasterxml.jackson.databind.ObjectMapper(b.build())
  }

  /** The LEGACY JSONPath dialect of json_extract/json_extract_scalar/
    * json_size (reference `operator/scalar/JsonExtract.java`, distinct
    * from the SQL/JSON 2016 language in [[JsonPathEval]]): `$` then
    * `.name` / `[index]` / `["name"]` / `[name]` steps. Every step is
    * a field-or-index token: on an ARRAY node a numeric token indexes,
    * on an OBJECT any token (numeric included) is a field lookup —
    * `$.1`, `$[1]` and `$["1"]` are interchangeable. A malformed path
    * raises (INVALID_FUNCTION_ARGUMENT in the reference); an
    * unparsable document is NULL. Accepts and ignores a leading
    * `lax `/`strict ` mode word for 2016-style callers. */
  private def legacyTokens(path0: String): Seq[String] = {
    val path = path0.trim.replaceFirst("(?i)^(lax|strict)\\s+", "")
    def invalid(): Nothing =
      throw new IllegalArgumentException(s"Invalid JSON path: '$path0'")
    if (!path.startsWith("$")) invalid()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          var j = i + 1
          while (j < path.length && path.charAt(j) != '.' && path.charAt(j) != '[')
            j += 1
          if (j == i + 1) invalid()
          out += path.substring(i + 1, j)
          i = j
        case '[' =>
          val close = path.indexOf(']', i)
          if (close < 0) invalid()
          var inner = path.substring(i + 1, close).trim
          if (inner.length >= 2 && inner.startsWith("\"") && inner.endsWith("\""))
            inner = inner.substring(1, inner.length - 1)
          else if (inner.length >= 2 && inner.startsWith("'") && inner.endsWith("'"))
            inner = inner.substring(1, inner.length - 1)
          if (inner.isEmpty) invalid()
          out += inner
          i = close + 1
        case _ => invalid()
      }
    }
    out.toSeq
  }

  private def legacyWalk(j: String, path: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    val toks = legacyTokens(path) // malformed path raises through
    var node: com.fasterxml.jackson.databind.JsonNode =
      try legacyJsonMapper.readTree(j)
      catch { case _: Exception => return None }
    for (t <- toks) {
      if (node == null) return None
      node =
        if (node.isArray) {
          val idx = try t.toInt catch { case _: Exception => return None }
          node.get(idx)
        } else if (node.isObject) node.get(t)
        else return None
    }
    Option(node)
  }

  /** json_parse (reference JsonFunctions.java varcharToJson): the
    * JSON type maps to VARCHAR here, so parsing = validate +
    * CANONICALIZE (compact form, like the reference's JSON value
    * rendering); an unparsable document raises the reference's
    * "Cannot convert value to JSON" error. json_format is the
    * inverse surface — on the varchar mapping it validates and
    * renders the same canonical text. */
  // json_parse must reject trailing garbage after a complete value
  // ('{}{' and '{}abc' are invalid documents in the reference)
  private val strictJsonMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.enable(
      com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  def jsonParse(s: String): String = {
    if (s == null) return null
    try {
      val n = strictJsonMapper.readTree(s)
      if (n == null || n.isMissingNode) throw new IllegalArgumentException(
        s"Cannot convert value to JSON: '$s'")
      n.toString
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException =>
        throw new IllegalArgumentException(
          s"Cannot convert value to JSON: '$s'")
    }
  }

  /** Legacy json_extract: the JSON TEXT at the path (compact form;
    * a JSON null is the text "null"); absent path / invalid doc →
    * NULL. */
  def jsonExtractLegacy(j: String, path: String): String = {
    if (j == null || path == null) return null
    legacyWalk(j, path).map(_.toString).orNull
  }

  /** Legacy json_extract_scalar: the scalar VALUE at the path as
    * text; containers and JSON null → NULL. */
  def jsonExtractScalarLegacy(j: String, path: String): String = {
    if (j == null || path == null) return null
    legacyWalk(j, path) match {
      case Some(n) if !n.isContainerNode && !n.isNull => n.asText()
      case _ => null
    }
  }

  /** json_size(json, path): number of keys of the object / elements
    * of the array at `path`, 0 for scalars, null for missing paths
    * (reference JsonFunctions.json_size). */
  def jsonSize(j: String, path: String): java.lang.Long = {
    if (j == null || path == null) return null
    legacyWalk(j, path) match {
      case Some(n) if n.isContainerNode => n.size().toLong
      case Some(_) => 0L
      case None => null
    }
  }

  /** Parse the doc + evaluate a full SQL/JSON 2016 path via
    * [[JsonPathEval]]. Returns None on EVALUATION error (mapped to the
    * caller's ON ERROR default); an UNSUPPORTED path construct raises
    * through (loud, never a silent NULL). An unparseable document is
    * an evaluation error. */
  private def jsonPathSeq(j: String, path: String)
      : Option[Vector[com.fasterxml.jackson.databind.JsonNode]] = {
    val parsed = JsonPathEval.parse(path) // UnsupportedPathError escapes
    val doc =
      try jsonMapper.readTree(j)
      catch { case _: Exception => return None }
    try Some(JsonPathEval.evaluate(doc, parsed))
    catch { case _: JsonPathEval.PathEvalError => None }
  }

  /** SQL/JSON 2016 `json_exists` (reference
    * `operator/scalar/json/JsonExistsFunction.java`, grammar
    * `SqlBase.g4:540-563`): true when the path resolves to ANY value,
    * including a JSON null; FALSE ON ERROR default. Full path language
    * (filters, wildcards, methods) via [[JsonPathEval]]. */
  def jsonExists(j: String, path: String): java.lang.Boolean = {
    if (j == null || path == null) return null
    jsonPathSeq(j, path) match {
      case Some(seq) => Boolean.box(seq.nonEmpty)
      case None => Boolean.box(false) // FALSE ON ERROR
    }
  }

  /** SQL/JSON 2016 `json_value` (reference JsonValueFunction.java):
    * the SINGLETON SCALAR at the path as text; NULL for an empty
    * result (NULL ON EMPTY), and NULL ON ERROR for a container, a
    * multi-item result, or an evaluation error. A JSON null yields
    * SQL NULL. RETURNING types are handled by the dialect layer as an
    * outer CAST. */
  def jsonValue(j: String, path: String): String = {
    if (j == null || path == null) return null
    jsonPathSeq(j, path) match {
      case Some(seq) =>
        if (seq.isEmpty) null // NULL ON EMPTY
        else if (seq.length > 1) null // multi-item → error → NULL
        else {
          val node = seq.head
          if (node.isNull || node.isContainerNode) null
          else node.asText()
        }
      case None => null // NULL ON ERROR
    }
  }

  /** SQL/JSON 2016 `json_query` (reference JsonQueryFunction.java):
    * the JSON TEXT at the path — containers in compact form, strings
    * kept JSON-quoted; WITHOUT ARRAY WRAPPER default, so a multi-item
    * result is an error (NULL). NULL for a missing path (NULL ON
    * EMPTY) and for a JSON null (diverges from a pedantic reading of
    * the standard, which would render `null`; matches the common
    * json_extract behavior the oracle pins). */
  def jsonQuery(j: String, path: String): String = {
    if (j == null || path == null) return null
    jsonPathSeq(j, path) match {
      case Some(seq) =>
        if (seq.isEmpty) null
        else if (seq.length > 1) null // needs WITH ARRAY WRAPPER
        else if (seq.head.isNull) null
        else seq.head.toString
      case None => null
    }
  }

  /** Shared PASSING-aware path run: parse bindings, evaluate, map
    * outcomes to the status codes of [[SqlJsonStr]] (0 ok / 1 empty /
    * 2 error). An unparsable input document and an unparsable FORMAT
    * JSON binding are both evaluation errors, like the reference's
    * JsonInputConversionError. */
  private def jsonPathSeqX(j: String, path: String,
      vars: Map[String, String])
      : Either[Int, Vector[com.fasterxml.jackson.databind.JsonNode]] = {
    val parsed = JsonPathEval.parse(path) // UnsupportedPathError escapes
    val doc =
      try jsonMapper.readTree(j)
      catch { case _: Exception => return Left(2) }
    if (doc == null) return Left(2)
    val bound =
      try vars.map { case (k, v) =>
        k -> (if (v == null) None else Some(jsonMapper.readTree(v)))
      }
      catch { case _: Exception => return Left(2) }
    try Right(JsonPathEval.evaluate(doc, parsed, bound))
    catch { case _: JsonPathEval.PathEvalError => Left(2) }
  }

  /** json_value with clause support: singleton scalar as text; JSON
    * null → SQL null (status 0). Containers and multi-item results
    * are errors per the standard. */
  def jsonValueX(j: String, path: String,
      vars: Map[String, String]): SqlJsonStr = {
    // NULL input -> NULL result (testNullInput), NOT the ON EMPTY path
    if (j == null || path == null) return SqlJsonStr(0, null)
    jsonPathSeqX(j, path, vars) match {
      case Left(st) => SqlJsonStr(st, null)
      case Right(seq) =>
        if (seq.isEmpty) SqlJsonStr(1, null)
        else if (seq.length > 1) SqlJsonStr(2, null)
        else {
          val node = seq.head
          if (node.isContainerNode) SqlJsonStr(2, null)
          else if (node.isNull) SqlJsonStr(0, null)
          else SqlJsonStr(0, node.asText())
        }
    }
  }

  /** json_query with clause support. `wrapper`: 0 WITHOUT (multi-item
    * → error), 1 WITH UNCONDITIONAL, 2 WITH CONDITIONAL (wrap unless
    * exactly one array/object). `omitQuotes` renders a lone string
    * scalar unquoted. JSON null renders as the text `null` (standard
    * semantics — the plain 2-arg wrapper keeps its oracle-pinned NULL
    * instead). */
  def jsonQueryX(j: String, path: String, vars: Map[String, String],
      wrapper: Int, omitQuotes: Boolean): SqlJsonStr = {
    // NULL input -> NULL result (testNullInput), NOT the ON EMPTY path
    if (j == null || path == null) return SqlJsonStr(0, null)
    jsonPathSeqX(j, path, vars) match {
      case Left(st) => SqlJsonStr(st, null)
      case Right(seq) =>
        if (seq.isEmpty) SqlJsonStr(1, null)
        else {
          val wrap = wrapper match {
            case 1 => true
            case 2 => seq.length != 1 || !seq.head.isContainerNode
            case _ => false
          }
          if (wrap) {
            val arr = jsonMapper.createArrayNode()
            seq.foreach(arr.add)
            SqlJsonStr(0, arr.toString)
          }
          else if (seq.length > 1) SqlJsonStr(2, null)
          else {
            val node = seq.head
            if (omitQuotes && node.isTextual) SqlJsonStr(0, node.asText())
            else SqlJsonStr(0, node.toString)
          }
        }
    }
  }

  /** json_exists with clause support: status 2 carries evaluation
    * errors out to the ON ERROR CASE arm (default FALSE). */
  def jsonExistsX(j: String, path: String,
      vars: Map[String, String]): SqlJsonBool = {
    if (j == null || path == null) return SqlJsonBool(0, null)
    jsonPathSeqX(j, path, vars) match {
      case Left(st) => SqlJsonBool(st, null)
      case Right(seq) => SqlJsonBool(0, Boolean.box(seq.nonEmpty))
    }
  }

  /** Validate + minify a JSON text (FORMAT JSON constructor values):
    * malformed input raises the reference's input-conversion error;
    * Jackson's tree round-trip minifies whitespace and keeps one entry
    * per duplicate object key. */
  def jsonNorm(s: String): String = {
    if (s == null) return null
    val node =
      try jsonMapper.readTree(s)
      catch { case _: Exception =>
        throw new IllegalArgumentException("conversion to JSON failed: ") }
    if (node == null)
      throw new IllegalArgumentException("conversion to JSON failed: ")
    node.toString
  }

  /** is_json_scalar (reference JsonFunctions.java): valid JSON whose
    * top-level value is not an object/array. */
  def isJsonScalar(j: String): java.lang.Boolean = {
    val node = try jsonMapper.readTree(j) catch { case _: Exception => null }
    if (node == null) false else !node.isContainerNode
  }

  /** json_array_contains(json, value): membership in a top-level JSON
    * array; numeric values compare numerically, others by text. */
  def jsonArrayContains(j: String, v: String): java.lang.Boolean = {
    if (j == null || v == null) return null
    val node = try jsonMapper.readTree(j) catch { case _: Exception => return null }
    if (node == null || !node.isArray) return null
    val asNum = try Some(v.toDouble) catch { case _: Exception => None }
    val it = node.elements()
    while (it.hasNext) {
      val e = it.next()
      val hit =
        if (e.isNumber && asNum.isDefined) e.asDouble() == asNum.get
        else if (e.isTextual) e.asText() == v
        else if (e.isBoolean) e.asBoolean().toString == v
        else false
      if (hit) return true
    }
    false
  }

  /** json_array_get(json, index): element as JSON text; negative
    * indices count from the end (reference JsonFunctions.java). */
  def jsonArrayGet(j: String, i: Long): String = {
    if (j == null) return null
    val node = try jsonMapper.readTree(j) catch { case _: Exception => return null }
    if (node == null || !node.isArray) return null
    val n = node.size()
    val idx = if (i < 0) n + i else i
    if (idx < 0 || idx >= n) return null
    val e = node.get(idx.toInt)
    if (e == null || e.isNull) null
    else if (e.isTextual) e.asText() // scalar string unquoted, like element_at
    else e.toString
  }

  /** Luhn checksum validation (reference LuhnCheckFunction.java). */
  def luhnCheck(s: String): Boolean = {
    if (s == null || s.isEmpty || !s.forall(_.isDigit)) return false
    var sum = 0
    var alt = false
    var i = s.length - 1
    while (i >= 0) {
      var d = s.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }
}

/** Session-extension entry point: usable both programmatically
  * (`Graft.session` does `.withExtensions(new GraftExtensions)`) and
  * via `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}

/** Status-struct results for the SQL/JSON clause forms (top-level for
  * Spark's UDF encoder): status 0 = ok, 1 = empty sequence, 2 =
  * evaluation error. */
case class SqlJsonStr(status: Int, value: String)
case class SqlJsonBool(status: Int, value: java.lang.Boolean)
