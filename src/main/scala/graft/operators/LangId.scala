package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-language identification via character-n-gram profile scoring
  * (Cavnar & Trenkle "N-Gram-Based Text Categorization", 1994-style):
  * each language carries a fixed profile of its most characteristic
  * character n-grams with rank weights; a document scores
  * `Σ occurrences(g) · weight(lang, g)` per language and is labeled
  * with the argmax (ties → lexicographically first language, no hit at
  * all → "und").
  *
  * INTEGER-EXACT BY CONSTRUCTION: occurrences are n-gram-explode
  * counts and weights are small ints, so scores are exact longs any
  * engine reproduces — which is what makes per-doc language ID
  * oracle-checkable in DuckDB ([[docSql]] renders the identical
  * computation, VALUES-literal profile included, from the same
  * constants — the two sides cannot drift).
  *
  * Scale shape: one narrow n-gram explode (≈ 3·|text| rows per doc,
  * the same cost class as tokenization), one broadcast hash join
  * against the 20×64-row profile, one partial-aggregated (doc, lang)
  * sum, one tiny (≤ |langs| rows per doc) argmax agg. No self-joins,
  * nothing corpus-sized ever shuffles twice — linear at 100 TB.
  *
  * Profile construction (all embedded constants, public linguistic
  * knowledge):
  *  - Space-delimited scripts: the language's highest-frequency
  *    function words in descending frequency order, Zipf-expanded
  *    (top-4 words ×3, next 8 ×2 — running text is dominated by its
  *    few most frequent words, and the expansion puts boundary
  *    trigrams like "_th"/"he_"/"_de" at realistic relative ranks),
  *    then top-64 TRIGRAMS by (count desc, gram asc), weight =
  *    64 − rank. Function words dominate every register of real text,
  *    so their trigrams are dense in documents of the language and
  *    near-absent otherwise.
  *  - Unspaced ideographic scripts (zh, ja): running-text samples and
  *    UNIGRAM/BIGRAM profiles (boundary-free) — the standard CJK
  *    treatment (character identity IS the signal; word-boundary
  *    trigrams never occur in unsegmented text). Document extraction
  *    is uniform (all 1-, 2-, 3-grams); since alphabetic profiles
  *    contain only trigrams and CJK profiles only uni/bigrams, neither
  *    family's extraction leaks noise into the other.
  * Closely related pairs (da/sv/nl, ru/uk, es/pt) stay separable
  * because rank weights differ on the shared n-grams while each profile
  * keeps ~half its mass in language-unique ones (LangIdSpec pins one
  * real sentence per language, all 20 correct).
  */
object LangId {

  /** N-grams kept per language; weight of rank r is ProfileSize − r. */
  val ProfileSize = 64

  /** Function-word samples for space-delimited scripts, one per
    * language, words in descending corpus-frequency order — all
    * lowercase (sidesteps engine case-mapping edge cases; the scorer
    * lowercases documents with the engines' shared simple mapping). */
  private[operators] val spacedSamples: Seq[(String, String)] = Seq(
    "ar" -> ("في من على أن إلى عن هذا التي الذي كان مع لا ما هو هي لكن كل "
      + "عند قد أو ثم حتى إذا بعد قبل غير بين كما لم أي منذ حيث تم وقد كانت ليس عليه"),
    "cs" -> ("a v se na je že o s z do i to jako by ale po co tak za "
      + "který podle jeho však bude nebo aby jen už být při ze které pro má od pak tím"),
    "da" -> ("og i at det er en den til på de med han af for ikke der var "
      + "mig sig men et har om vi min havde ham hun nu over da fra du ud sin dem os op man"),
    "de" -> ("der die das und ist von zu mit den nicht ein eine auf für im "
      + "sich des dem er es auch als an werden aus bei nach wird über einen so um haben "
      + "nur oder wenn aber noch wie einem einer"),
    "el" -> ("και το να της είναι που δεν την με τον των στο για από ένα "
      + "μια τους ότι αυτό οι τα σε θα ήταν στη μας πολύ αλλά όπως κατά μετά πριν χωρίς"),
    "en" -> ("the of and to in is was that it for on as with be by at this "
      + "had not are but from or have an they which one you were all her she there been"),
    "es" -> ("de la que el en y los se del las un por con una su para es al "
      + "lo como más pero sus le ya o fue este ha sí porque esta son entre cuando muy "
      + "sin sobre también"),
    "fi" -> ("ja on ei se että oli hän mutta kun ovat niin kuin myös jos "
      + "vain joka mitä nyt sitten tai sen kanssa ole mukaan jo hyvin siitä tässä tämä "
      + "olla ollut"),
    "fr" -> ("le de la et les des est un une dans que qui pour sur pas plus "
      + "par avec au il ne se ce du elle aux comme mais ou nous vous dont être cette "
      + "ses leur sans sont"),
    "it" -> ("di e il la che è per una in un sono mi si lo ma le con se ci "
      + "non come più questo qui del alla della nel sulla gli dei delle anche quando "
      + "essere fatto"),
    "nl" -> ("de het een van en in is dat op te zijn met voor niet aan er "
      + "om door maar als dan zij ook bij dit toch wel worden geen nog hebben werd "
      + "wordt over naar"),
    "pl" -> ("w i z na do że się nie jest to jak po co tak za od ale czy "
      + "przez jego ich tym być ma przy dla które który tylko już można bardzo przed "
      + "jednak także"),
    "pt" -> ("de a o que e do da em um para com não uma os no se na por "
      + "mais as dos como mas ao ele das seu sua ou quando muito nos já eu também só "
      + "pelo pela até isso"),
    "ro" -> ("de a în și la cu o pe este un pentru care nu se mai din sau "
      + "dar dacă fost fie sunt după când avea ani lui între prin despre unde acest "
      + "ce ar fi"),
    "ru" -> ("и в не на я что он с как это был его но по к она этот они мы "
      + "за из у же от то все а о так для мне было бы вот кто да когда только"),
    "sv" -> ("och i att det som en på är av för med den till inte har de "
      + "ett om han men var sig från vi så här kan när över ut efter vid mot där sedan "
      + "under något"),
    "tr" -> ("bir ve bu da ne için ile de çok daha o ben gibi ama var mı en "
      + "sen kadar sonra onu her şey beni bana olarak yok ki diye mi benim onun olan değil"),
    "uk" -> ("і в не на що я з до він як але це був за його вона по у від "
      + "ми так або коли для мене було вже тут цей про також може бути його яких"))

  /** Running-text samples for the unspaced ideographic scripts —
    * everyday sentences built from the script's highest-frequency
    * characters and constructions (kana particles / copula morphology
    * for ja; 的/是/了/我-class function characters for zh). */
  private[operators] val cjkSamples: Seq[(String, String)] = Seq(
    "ja" -> ("これはペンです 私は学生です 日本語の勉強をしています それはとてもいいですね "
      + "彼は東京に住んでいます 今日は天気がいいです 何をしていますか ありがとうございます "
      + "この本はとても面白いです 明日また来てください 私たちは友達です "
      + "それを見たことがあります もう少し待ってください"),
    "zh" -> ("我们的朋友是一个好人 他们在这里工作 我想去中国学习中文 这是一个很大的问题 "
      + "你们有没有时间 他说的话很有意思 我们一起去吃饭吧 现在是什么时候 这个地方非常漂亮 "
      + "我不知道他在哪里 这样做是不对的 他已经来了很久了 大家都很高兴 那是什么东西 "
      + "请问现在几点了"))

  /** The supported language codes, sorted. */
  val languages: Seq[String] = (spacedSamples.map(_._1) ++ cjkSamples.map(_._1)).sorted

  /** Engine-portable case handling: Spark (JVM) and DuckDB (utf8proc)
    * disagree on two Unicode lowercase special cases — Turkish dotted
    * İ (JVM full-maps to "i"+U+0307, utf8proc simple-maps to "i") and
    * Greek capital Σ (the JVM applies the contextual final-sigma rule,
    * utf8proc maps Σ→σ unconditionally). Both engines' profile sets
    * include tr and el, so documents carrying those uppercase forms
    * could diverge from the oracle. Pre-translating İ→i and Σ/ς→σ
    * BEFORE lowercasing removes every divergent input; the remaining
    * lower() is the shared simple mapping on both engines. Applied
    * identically in profile construction (here), [[predict]], and
    * [[docSql]] — the three sides cannot drift. */
  private[operators] val CaseFrom = "İΣς"
  private[operators] val CaseTo = "iσσ"
  private def portableLower(s: String): String = {
    val pre = s.map { c =>
      val i = CaseFrom.indexOf(c.toInt)
      if (i >= 0) CaseTo.charAt(i) else c
    }
    pre.toLowerCase(java.util.Locale.ROOT)
  }

  private def normalize(s: String): String =
    "_" + portableLower(s).trim.replaceAll("\\s+", "_") + "_"

  /** Zipf expansion: the word lists are in descending frequency order;
    * real running text repeats its head words, so weight them (×3 for
    * the top 4, ×2 for the next 8) before counting trigrams. */
  private def zipfExpand(sample: String): String =
    sample.split("\\s+").zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(if (i < 4) 3 else if (i < 12) 2 else 1)(w)
    }.mkString(" ")

  private def topGrams(grams: Seq[String]): Seq[(String, Int)] = {
    val counts = grams.groupBy(identity).map { case (g, occ) => (g, occ.size) }.toSeq
    counts.sortBy { case (g, c) => (-c, g) }.take(ProfileSize)
      .zipWithIndex.map { case ((g, _), r) => (g, ProfileSize - r) }
  }

  /** Build one language's profile rows from a sample text — the same
    * machinery the embedded 20-language set uses, PUBLIC so callers
    * can add languages without editing this operator: pass the result
    * (concatenated with [[profiles]] or a custom set) to
    * [[predict]]/[[docSql]]'s `profileRows`. `sample` should list the
    * language's highest-frequency words in descending order (spaced
    * scripts; Zipf expansion is applied here) or be running text
    * (`cjk = true`: boundary-free uni/bigram profile). */
  def buildProfile(lang: String, sample: String,
                   cjk: Boolean = false): Seq[(String, String, Int)] =
    if (cjk) {
      val t = normalize(sample)
      val grams = for {
        n <- Seq(1, 2); i <- 0 to t.length - n
        g = t.substring(i, i + n) if !g.contains("_")
      } yield g
      topGrams(grams).map { case (g, w) => (lang, g, w) }
    } else {
      val t = normalize(zipfExpand(sample))
      topGrams((0 to t.length - 3).map(i => t.substring(i, i + 3)))
        .map { case (g, w) => (lang, g, w) }
    }

  /** (lang, gram, weight) rows — the single source of truth both the
    * Spark plan and the generated oracle SQL consume. */
  val profiles: Seq[(String, String, Int)] =
    spacedSamples.flatMap { case (lang, text) => buildProfile(lang, text) } ++
      cjkSamples.flatMap { case (lang, text) =>
        buildProfile(lang, text, cjk = true)
      }

  /** All 1-, 2-, and 3-grams of the normalized text column (uniform
    * extraction: alphabetic profiles hold only trigrams, CJK profiles
    * only uni/bigrams, so neither leaks noise into the other). */
  private def gramsCol(t: Column): Column = {
    def ofLen(n: Int) =
      when(length(t) >= n,
        transform(sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    concat(ofLen(1), ofLen(2), ofLen(3))
  }

  /** Per-document language prediction: (idCol, lang_pred, score,
    * margin) — score is the exact integer profile hit mass of the
    * winner, margin the winner's lead over the runner-up language (=
    * score when only one language scored at all; the standard
    * close-call signal: small margin ⇒ mixed/ambiguous text). No
    * profile n-gram at all → ("und", 0, 0). `profileRows` defaults to
    * the embedded 20-language set; callers extend or replace it with
    * [[buildProfile]] output. */
  def predict(df: DataFrame, idCol: String, textCol: String,
              profileRows: Seq[(String, String, Int)] = profiles): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prof = broadcast(profileRows.toDF("lang", "g", "w"))
    val norm = concat(lit("_"),
      regexp_replace(
        lower(translate(coalesce(col(textCol), lit("")),
          CaseFrom, CaseTo)),
        "\\s+", "_"),
      lit("_"))
    val grams = df.select(col(idCol).as("id"), norm.as("t"))
      .select(col("id"), explode(gramsCol(col("t"))).as("g"))
    val scored = grams.join(prof, "g")
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("w")).cast("long").as("score"))
    // rank per doc by sorting the ≤|langs| (−score, lang) structs:
    // index 0 = max score with lexicographic lang tie-break (the same
    // total order the oracle's row_number uses), index 1 = runner-up
    val best = scored
      .groupBy(col("id"))
      .agg(sort_array(collect_list(
        struct((-col("score")).as("ns"), col("lang").as("l")))).as("bs"))
      .select(col("id"),
        col("bs")(0).getField("l").as("lang_pred"),
        (-col("bs")(0).getField("ns")).cast("long").as("score"),
        ((-col("bs")(0).getField("ns")) -
          coalesce(-try_element_at(col("bs"), lit(2)).getField("ns"), lit(0L)))
          .cast("long").as("margin"))
    df.select(col(idCol).as("id"))
      .join(best, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("lang_pred"), lit("und")).as("lang_pred"),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("margin"), lit(0L)).as("margin"))
  }

  /** The profile as a DuckDB VALUES literal (samples contain no quote
    * characters by construction — asserted, so a future sample edit
    * cannot silently corrupt the SQL). */
  def profileValuesSql(profileRows: Seq[(String, String, Int)] = profiles): String = {
    require(profileRows.forall { case (l, g, _) => !l.contains("'") && !g.contains("'") },
      "profile entries must not contain single quotes")
    profileRows.map { case (l, g, w) => s"('$l','$g',$w)" }.mkString(",")
  }

  /** DuckDB replay of [[predict]] over `table`: identical n-gram
    * extraction, profile join, scoring, and tie-break (including the
    * portable pre-lower translate — see [[CaseFrom]]). */
  def docSql(table: String, idCol: String, textCol: String,
             profileRows: Seq[(String, String, Int)] = profiles): String = s"""
      WITH prof(lang, g, w) AS (VALUES ${profileValuesSql(profileRows)}),
      norm AS (
        SELECT $idCol AS id,
               '_' || regexp_replace(lower(translate(coalesce($textCol, ''), '$CaseFrom', '$CaseTo')), '\\s+', '_', 'g') || '_' AS t
        FROM $table),
      tri AS (
        SELECT id, unnest(
          list_transform(range(1, length(t) + 1),
            i -> substring(t, CAST(i AS INT), 1))
          || list_transform(range(1, length(t)),
               i -> substring(t, CAST(i AS INT), 2))
          || CASE WHEN length(t) >= 3 THEN
               list_transform(range(1, length(t) - 1),
                 i -> substring(t, CAST(i AS INT), 3))
             ELSE CAST([] AS VARCHAR[]) END) AS g
        FROM norm),
      sc AS (
        SELECT id, lang, CAST(sum(w) AS BIGINT) AS score
        FROM tri JOIN prof ON tri.g = prof.g
        GROUP BY 1, 2),
      ranked AS (
        SELECT id, lang, score,
               row_number() OVER (PARTITION BY id
                 ORDER BY score DESC, lang ASC) AS rnk
        FROM sc),
      best AS (
        SELECT r1.id, r1.lang, r1.score,
               r1.score - coalesce(r2.score, 0) AS margin
        FROM (SELECT * FROM ranked WHERE rnk = 1) r1
        LEFT JOIN (SELECT * FROM ranked WHERE rnk = 2) r2 ON r1.id = r2.id)
      SELECT n.id AS $idCol,
             coalesce(b.lang, 'und') AS lang_pred,
             coalesce(b.score, 0) AS score,
             coalesce(b.margin, 0) AS margin
      FROM norm n LEFT JOIN best b ON n.id = b.id"""

  // ---- Unicode script composition --------------------------------------

  /** The classified BMP script blocks, in output-column order:
    * (name, inclusive codepoint ranges). Deliberately coarse — block
    * granularity, Latin spanning Basic+Supplement+Extended (the ×/÷
    * signs inside Latin-1 ride along; a composition signal, not a
    * validator). Astral codepoints and unlisted blocks land in
    * `other`. */
  private[operators] val ScriptRanges: Seq[(String, Seq[(Int, Int)])] = Seq(
    "digit" -> Seq((0x30, 0x39)),
    "latin" -> Seq((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)),
    "greek" -> Seq((0x370, 0x3FF)),
    "cyrillic" -> Seq((0x400, 0x4FF)),
    "hebrew" -> Seq((0x590, 0x5FF)),
    "arabic" -> Seq((0x600, 0x6FF)),
    "devanagari" -> Seq((0x900, 0x97F)),
    "kana" -> Seq((0x3040, 0x30FF)),
    "cjk" -> Seq((0x4E00, 0x9FFF)),
    "hangul" -> Seq((0xAC00, 0xD7AF)))

  private def cp(i: Int): String = new String(Character.toChars(i))

  /** Per-group Unicode-SCRIPT composition — the worldwide complement
    * to the n-gram profiles above (which cover space-delimited
    * Latin-script languages): per `groupCol`, the share of non-space
    * characters in each major script block, in exact integer basis
    * points — the signal that routes a slice to the right language
    * pipeline (or flags mixed-script spam) without any model.
    *
    * Engine-exact WITHOUT a codepoint function: characters come from
    * codepoint-indexed substrings (both engines' substring/length
    * count codepoints) and classification is string-RANGE comparison
    * — UTF-8 binary order IS codepoint order, so `c BETWEEN lo AND
    * hi` agrees bit for bit, astral characters included. Non-space =
    * above U+0020 and not the ideographic space U+3000.
    *
    * Scale: one narrow per-character explode (|text| rows — the
    * n-gram explode's cost class) into ONE map-side-combined group
    * aggregate of conditional sums; nothing corpus-sized shuffles.
    * Output: (groupCol, n_chars, <script>_bp per block, other_bp);
    * groups with no non-space characters emit no row. */
  def scriptMix(df: DataFrame, groupCol: String,
                textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val chars = df
      .select(col(groupCol), explode(transform(
        sequence(lit(1), length(t)), i => t.substr(i, lit(1)))).as("__c"))
      .filter(col("__c") > " " && col("__c") =!= cp(0x3000))
    def inBlock(ranges: Seq[(Int, Int)]) =
      ranges.map { case (lo, hi) =>
        col("__c") >= cp(lo) && col("__c") <= cp(hi)
      }.reduce(_ || _)
    val anyBlock = inBlock(ScriptRanges.flatMap(_._2))
    val aggs =
      ScriptRanges.map { case (name, ranges) =>
        sum(when(inBlock(ranges), 1L).otherwise(0L)).as(s"__n_$name")
      } :+ sum(when(anyBlock, 0L).otherwise(1L)).as("__n_other")
    val counted = chars.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_chars"), aggs: _*)
    val bps = (ScriptRanges.map(_._1) :+ "other").map(name =>
      expr(s"__n_$name * 10000 div n_chars").as(s"${name}_bp"))
    counted.select(col(groupCol) +: col("n_chars") +: bps: _*)
  }

  /** Per-group mixed-script WORD share — the homoglyph/confusable
    * signal ([[scriptMix]]'s word-grain sibling): a word whose
    * LETTERS span ≥ 2 script blocks ("раypal" — Cyrillic р/а spliced
    * into Latin) is the classic spoofing/spam shape; clean prose is
    * script-pure per word even in multilingual documents, so the
    * share of mixed words is a precise junk signal where a
    * doc-level mix fraction is not. Digits and unlisted characters
    * are script-NEUTRAL (codes like "x86" or "привет2024" stay
    * clean). Output: (groupCol, n_words, n_mixed, mixed_bp) — exact
    * integer basis points. Same engine-exactness argument as
    * scriptMix (codepoint substrings + string-range comparison);
    * plan: one word explode, per-word HOF arithmetic, one
    * map-side-combined group aggregate. */
  def mixedScriptWords(df: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val letterRanges = ScriptRanges.filter(_._1 != "digit")
    // per character: the index of its letter-script block, -1 for
    // neutral (digits, punctuation, unlisted)
    def idxOf(c: Column): Column =
      letterRanges.zipWithIndex.foldRight(lit(-1): Column) {
        case (((_, ranges), i), acc) =>
          when(ranges.map { case (lo, hi) =>
            c >= cp(lo) && c <= cp(hi)
          }.reduce(_ || _), lit(i)).otherwise(acc)
      }
    val mixed = {
      val w = col("__w")
      val idxs = transform(sequence(lit(1), length(w)),
        i => idxOf(w.substr(i, lit(1))))
      size(array_distinct(filter(idxs, x => x >= 0))) >= 2
    }
    df.select(col(groupCol),
        explode(graft.functions.TextFns.tokens(coalesce(col(textCol),
          lit("")))).as("__w"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"),
        sum(when(mixed, 1L).otherwise(0L)).as("n_mixed"))
      .withColumn("mixed_bp", expr("n_mixed * 10000 div n_words"))
  }

  /** DuckDB replay of [[mixedScriptWords]]. */
  def mixedScriptWordsOracle(table: String, groupCol: String,
                             textCol: String): String = {
    val letterRanges = ScriptRanges.filter(_._1 != "digit")
    val caseArms = letterRanges.zipWithIndex.map { case ((_, ranges), i) =>
      val cond = ranges
        .map { case (lo, hi) => s"(c >= chr($lo) AND c <= chr($hi))" }
        .mkString(" OR ")
      s"WHEN $cond THEN $i"
    }.mkString(" ")
    s"""
      WITH w AS (
        SELECT $groupCol, unnest(list_filter(
          string_split_regex(coalesce($textCol, ''), '\\s+'),
          x -> x <> '')) AS word
        FROM $table),
      flagged AS (
        SELECT $groupCol,
               len(list_distinct(list_filter(
                 list_transform(
                   list_transform(range(1, length(word) + 1),
                     i -> substring(word, CAST(i AS INT), 1)),
                   c -> CASE $caseArms ELSE -1 END),
                 x -> x >= 0))) >= 2 AS mixed
        FROM w)
      SELECT $groupCol,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN mixed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mixed,
             CAST(sum(CASE WHEN mixed THEN 1 ELSE 0 END) * 10000
               // count(*) AS BIGINT) AS mixed_bp
      FROM flagged
      GROUP BY $groupCol
      ORDER BY $groupCol"""
  }

  /** DuckDB replay of [[scriptMix]] — ranges rendered as chr()
    * bounds from the SAME constants. */
  def scriptMixOracle(table: String, groupCol: String,
                      textCol: String): String = {
    def cond(ranges: Seq[(Int, Int)]) = ranges
      .map { case (lo, hi) => s"(c >= chr($lo) AND c <= chr($hi))" }
      .mkString(" OR ")
    val classCols = ScriptRanges.map { case (name, ranges) =>
      s"""CAST(sum(CASE WHEN ${cond(ranges)} THEN 1 ELSE 0 END)
             * 10000 // count(*) AS BIGINT) AS ${name}_bp"""
    }
    val otherCol =
      s"""CAST(sum(CASE WHEN ${cond(ScriptRanges.flatMap(_._2))}
             THEN 0 ELSE 1 END) * 10000 // count(*) AS BIGINT) AS other_bp"""
    s"""
      WITH ch AS (
        SELECT $groupCol, c FROM (
          SELECT $groupCol,
                 unnest(list_transform(range(1, length(t) + 1),
                   i -> substring(t, CAST(i AS INT), 1))) AS c
          FROM (SELECT $groupCol, coalesce($textCol, '') AS t FROM $table))
        WHERE c > ' ' AND c <> chr(12288))
      SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_chars,
             ${(classCols :+ otherCol).mkString(",\n             ")}
      FROM ch
      GROUP BY $groupCol
      ORDER BY $groupCol"""
  }
}
