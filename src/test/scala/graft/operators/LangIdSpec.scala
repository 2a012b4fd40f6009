package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LangId]] — the 20-language character-trigram profile scorer. The
  * oracle (q129/q34) proves engine parity; THIS spec proves the scorer
  * actually discriminates real languages, which no oracle over the
  * synthetic (English-token) corpus can show. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def predictOne(rows: Seq[(Long, String)]): Map[Long, (String, Long)] =
    LangId.predict(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("one real sentence per language, all 20 identified correctly") {
    val fixtures: Seq[(String, String)] = Seq(
      "en" -> "the quick brown fox jumped over the lazy dog and ran into the forest with all of the others",
      "de" -> "der schnelle braune fuchs sprang über den faulen hund und lief mit den anderen in den wald",
      "fr" -> "le renard brun rapide a sauté par dessus le chien paresseux et il est parti dans la forêt avec les autres",
      "es" -> "el zorro marrón rápido saltó sobre el perro perezoso y corrió hacia el bosque con los otros",
      "pt" -> "a raposa marrom rápida pulou sobre o cachorro preguiçoso e correu para a floresta com os outros",
      "it" -> "la volpe marrone veloce è saltata sopra il cane pigro e poi è corsa nella foresta con gli altri",
      "nl" -> "de snelle bruine vos sprong over de luie hond en rende met de anderen het bos in",
      "da" -> "den hurtige brune ræv sprang over den dovne hund og løb ind i skoven med alle de andre",
      "sv" -> "det är ett vackert väder idag och jag ska åka in till staden för att köpa något till alla",
      "fi" -> "nopea ruskea kettu hyppäsi laiskan koiran yli ja juoksi metsään kaikkien muiden kanssa",
      "pl" -> "szybki brązowy lis przeskoczył nad leniwym psem i pobiegł do lasu razem z innymi",
      "cs" -> "rychlá hnědá liška přeskočila líného psa a běžela do lesa spolu s ostatními",
      "ro" -> "vulpea maro rapidă a sărit peste câinele leneș și a fugit în pădure împreună cu ceilalți",
      "tr" -> "hızlı kahverengi tilki tembel köpeğin üzerinden atladı ve diğerleriyle birlikte ormana doğru koştu",
      "ru" -> "быстрая коричневая лиса перепрыгнула через ленивую собаку и побежала в лес вместе с другими",
      "uk" -> "швидка коричнева лисиця перестрибнула через ледачого собаку і побігла до лісу разом з іншими",
      "el" -> "η γρήγορη καφέ αλεπού πήδηξε πάνω από τον τεμπέλη σκύλο και έτρεξε στο δάσος με τους άλλους",
      "ja" -> "すばやい茶色の狐は怠け者の犬を飛び越えて、他のものと一緒に森の中へ走って行きました",
      "zh" -> "敏捷的棕色狐狸跳过了懒惰的狗然后和其他的一起跑进了森林里",
      "ar" -> "قفز الثعلب البني السريع فوق الكلب الكسول وركض إلى الغابة مع كل الآخرين")
    val got = predictOne(fixtures.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) })
    fixtures.zipWithIndex.foreach { case ((want, text), i) =>
      val (pred, score) = got(i.toLong)
      assert(pred == want, s"'$text' → $pred (score $score), wanted $want")
      assert(score > 0L)
    }
  }

  test("empty, null, and no-hit text fall back to und with score 0") {
    val got = predictOne(Seq(1L -> "", 2L -> null, 3L -> "12345 67890 ####"))
    got(1L) shouldBe ("und", 0L)
    got(2L) shouldBe ("und", 0L)
    got(3L) shouldBe ("und", 0L)
  }

  test("margin is the winner's lead over the runner-up; close pairs score low margins") {
    import spark.implicits._
    val rows = LangId.predict(Seq(
        (1L, "the quick brown fox jumped over the lazy dog and all of the others"),
        (2L, ""), // und → margin 0
        (3L, "の")) // single ja-only unigram: one language scores → margin = score
      .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val (l1, s1, m1) = rows(1L)
    l1 shouldBe "en"
    assert(m1 > 0 && m1 <= s1)
    rows(2L) shouldBe ("und", 0L, 0L)
    val (l3, s3, m3) = rows(3L)
    l3 shouldBe "ja"
    m3 shouldBe s3
  }

  test("profile table is well-formed: 20 languages, positive rank weights, trigram grams") {
    LangId.languages.size shouldBe 20
    val byLang = LangId.profiles.groupBy(_._1)
    byLang.keySet shouldBe LangId.languages.toSet
    LangId.profiles.foreach { case (lang, g, w) =>
      if (lang == "zh" || lang == "ja")
        assert(g.length >= 1 && g.length <= 2 && !g.contains("_"),
          s"$lang gram '$g' must be a boundary-free uni/bigram")
      else
        assert(g.length == 3, s"$lang gram '$g' is not a trigram")
      assert(w >= 1 && w <= LangId.ProfileSize)
    }
    // weights within a language are distinct ranks (a stable argmax needs
    // the rank structure intact)
    byLang.values.foreach { ps =>
      ps.map(_._3).distinct.size shouldBe ps.size
    }
  }

  test("caller-supplied profiles: a toy language added via buildProfile is detected, stock set untouched") {
    import spark.implicits._
    // an invented language whose function words share no trigram with
    // any real profile (qq/xx/zz letter pairs never occur in them)
    val toySample = "qxq zqz xqx qzq zxz xzx qqz zzx xxq qzz zxx xqq"
    val toy = LangId.buildProfile("xx", toySample)
    toy.foreach { case (l, g, _) => l shouldBe "xx"; g.length shouldBe 3 }
    val extended = LangId.profiles ++ toy
    val docs = Seq(
      (1L, "qxq zqz xqx qzq qxq zqz"), // toy-language text
      (2L, "the cat and the dog were friends")).toDF("doc_id", "text")
    val out = LangId.predict(docs, "doc_id", "text", extended)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "xx"
    out(2L) shouldBe "en"
    // the stock set alone cannot know the toy language
    val stock = LangId.predict(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    stock(1L) should not be "xx"
  }

  test("portable case mapping: uppercase Greek (final Σ) and Turkish İ text still identify") {
    // JVM contextual final-sigma lowering and the İ full case mapping
    // are exactly where Spark and DuckDB lower() diverge; the
    // pre-lower translate pins both engines to the same simple form —
    // and means ALL-CAPS text of those languages still hits its
    // (lowercase-built) profile grams
    val out = predictOne(Seq(
      1L -> "ΚΑΙ ΤΟ ΝΑ ΤΗΣ ΕΙΝΑΙ ΠΟΥ ΔΕΝ ΤΗΝ ΜΕ ΤΟΝ ΤΩΝ ΣΤΟ ΓΙΑ ΑΥΤΟΣ",
      2L -> "BİR VE BU DA NE İÇİN İLE DE ÇOK DAHA GİBİ İSTANBUL"))
    out(1L)._1 shouldBe "el"
    out(2L)._1 shouldBe "tr"
  }

  test("score is the exact integer trigram hit mass (hand-computed fixture)") {
    // one word that IS an English profile source word, repeated: every
    // occurrence of each profile trigram must be counted (overlap-free
    // here by construction), so score doubles when the text doubles
    val one = predictOne(Seq(1L -> "the", 2L -> "the the"))
    val (l1, s1) = one(1L); val (l2, s2) = one(2L)
    l1 shouldBe "en"
    l2 shouldBe "en"
    // "_the_" trigrams: _th, the, he_ ; "_the_the_" adds e_t, _th, the, he_
    val w = LangId.profiles.collect { case ("en", g, wt) => g -> wt }.toMap
    s1 shouldBe Seq("_th", "the", "he_").flatMap(w.get).map(_.toLong).sum
    s2 shouldBe (2 * s1 + Seq("e_t").flatMap(w.get).map(_.toLong).sum)
  }

  test("scriptMix: hand-computed fractions; whitespace excluded; empty groups vanish") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 'да nyet 99' → non-space chars: д,а (cyrillic) n,y,e,t (latin)
    // 9,9 (digit) = 8 chars; U+3000 excluded like ASCII space
    val df = Seq(("a", "да nyet　99"), ("empty", " \t ")).toDF("g", "t")
    val rows = LangId.scriptMix(df, "g", "t").collect()
    rows should have size 1 // the all-whitespace group emits no row
    val r = rows.head
    r.getAs[Long]("n_chars") shouldBe 8L
    r.getAs[Long]("cyrillic_bp") shouldBe 2500L
    r.getAs[Long]("latin_bp") shouldBe 5000L
    r.getAs[Long]("digit_bp") shouldBe 2500L
    r.getAs[Long]("other_bp") shouldBe 0L
  }

  test("mixedScriptWords: spliced words flag, digit-suffixed and pure words stay clean") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      ("a", "раypal hello привет2024 x86"),    // 1 mixed of 4
      ("b", "чистый текст"))                   // pure Cyrillic: 0
      .toDF("g", "t")
    val rows = LangId.mixedScriptWords(df, "g", "t")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_mixed"),
          r.getAs[Long]("mixed_bp"))).toMap
    rows("a") shouldBe ((4L, 1L, 2500L))
    rows("b") shouldBe ((2L, 0L, 0L))
  }
}
