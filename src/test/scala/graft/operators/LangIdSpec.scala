package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LangIdSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** Held-out sentences (NOT in the profile snippets), two per language,
    * including the same-script neighbor pairs es/pt and sv/da. */
  val heldOut: Seq[(String, String)] = Seq(
    "en" -> "we walked along the narrow road while the rain kept falling on the fields",
    "en" -> "nobody knew why the old clock had stopped working that night",
    "de" -> "wir gingen die schmale straße entlang, während der regen weiter auf die felder fiel",
    "de" -> "niemand wusste, warum die alte uhr in jener nacht stehen geblieben war",
    "fr" -> "nous marchions le long de la route étroite pendant que la pluie tombait sur les champs",
    "fr" -> "personne ne savait pourquoi la vieille horloge s'était arrêtée cette nuit-là",
    "es" -> "caminábamos por el camino estrecho mientras la lluvia seguía cayendo sobre los campos",
    "es" -> "nadie sabía por qué el viejo reloj se había detenido aquella noche",
    "pt" -> "caminhávamos pela estrada estreita enquanto a chuva continuava caindo sobre os campos",
    "pt" -> "ninguém sabia por que o velho relógio tinha parado naquela noite",
    "it" -> "camminavamo lungo la strada stretta mentre la pioggia continuava a cadere sui campi",
    "it" -> "nessuno sapeva perché il vecchio orologio si fosse fermato quella notte",
    "nl" -> "we liepen langs de smalle weg terwijl de regen op de velden bleef vallen",
    "nl" -> "niemand wist waarom de oude klok die nacht was gestopt",
    "sv" -> "vi gick längs den smala vägen medan regnet fortsatte att falla över fälten",
    "sv" -> "ingen visste varför den gamla klockan hade stannat den natten",
    "da" -> "vi gik langs den smalle vej mens regnen blev ved med at falde over markerne",
    "da" -> "ingen vidste hvorfor det gamle ur var gået i stå den nat",
    "pl" -> "szliśmy wąską drogą, podczas gdy deszcz wciąż padał na pola",
    "pl" -> "nikt nie wiedział, dlaczego stary zegar zatrzymał się tamtej nocy",
    "tr" -> "dar yol boyunca yürürken yağmur tarlaların üzerine yağmaya devam ediyordu",
    "tr" -> "kimse eski saatin o gece neden durduğunu bilmiyordu",
    // non-Latin scripts (r18): ja-vs-zh is the same-script-family pair —
    // both use han characters, so the separator is kana grams plus the
    // Japanese-frequent vs Chinese-frequent character distributions
    "zh" -> "他们在火车上聊了很久，谈到了工作和家里的事情。",
    "zh" -> "这家饭馆的菜很好吃，我们决定下个月再来一次。",
    "ja" -> "彼らは電車の中で長い間話して、仕事や家のことについて語り合いました。",
    "ja" -> "この店の料理はとてもおいしかったので、来月また来ることにしました。",
    "ko" -> "그들은 기차 안에서 오랫동안 이야기하며 일과 집안일에 대해 말했습니다.",
    "ko" -> "이 식당의 음식이 아주 맛있어서 다음 달에 다시 오기로 했습니다.",
    "ru" -> "они долго разговаривали в поезде о работе и о домашних делах",
    "ru" -> "еда в этом ресторане была очень вкусной, и мы решили прийти снова",
    "ar" -> "تحدثوا طويلا في القطار عن العمل وعن أمور البيت",
    "ar" -> "كان الطعام في هذا المطعم لذيذا جدا فقررنا أن نعود في الشهر القادم",
    "hi" -> "उन्होंने रेलगाड़ी में देर तक काम और घर की बातों पर चर्चा की",
    "hi" -> "इस भोजनालय का खाना बहुत स्वादिष्ट था, हमने अगले महीने फिर आने का फैसला किया")

  test("held-out sentences classify correctly, incl. es/pt and sv/da pairs") {
    val wrong = heldOut.flatMap { case (expected, text) =>
      val got = LangId.classify(text)
      if (got != expected) Some(s"'$text' -> $got (expected $expected)") else None
    }
    assert(wrong.isEmpty, wrong.mkString("\n"))
  }

  test("ja-vs-zh: hanzi-only zh (the crawl arm's shape) does not leak to ja") {
    // no kana to lean on — the han-character distribution alone decides
    assert(LangId.classify("你好世界这是一个测试的报告编号 42") === "zh")
    assert(LangId.classify("我们需要一个新的计划来解决这个问题") === "zh")
  }

  test("kernel edge cases: null, empty, no letters, huge input bounded") {
    assert(LangId.classify(null) === null)
    assert(LangId.classify("") === null)
    assert(LangId.classify("12345 !!! 678") === null)
    // input far beyond maxChars classifies from the capped prefix only
    val big = ("the rain kept falling on the fields " * 2000) + "zzz"
    assert(LangId.classify(big) === "en")
  }

  test("expression path: codegen column + SQL function agree with the kernel") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = heldOut.zipWithIndex
      .map { case ((exp, text), i) => (i.toLong, exp, text) }
      .toDF("id", "expected", "text")
    val viaCol = df.select(col("id"), LangId.langid(col("text")).as("lang"),
        col("expected"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(viaCol.forall { case (got, exp) => got == exp })
    // null text flows through as null
    val n = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(LangId.langid(col("text"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("lm_quality_buckets arms: planted prefix survives a 40-char English salad tail") {
    // the exact composition the lm_quality_buckets query builds: planted
    // language prefix + ' ' + substr(text, 1, 40) of the word-salad corpus
    val tail = " key agg row scan slow fast table value pa"
    assert(LangId.classify(
      "the quick brown fox jumps over the lazy dog near the river bank today" + tail) === "en")
    assert(LangId.classify(
      "в этом документе говорится о последних новостях и погоде в москве сегодня вечером" + tail) === "ru")
    assert(LangId.classify(
      "这是一个关于新闻和天气的中文文档今天晚上在北京发布的内容" + tail) === "zh")
    assert(LangId.classify(
      "هذه وثيقة باللغة العربية عن الأخبار والطقس في المساء اليوم" + tail) === "ar")
  }

  test("script gating: CJK body beats a longer Latin tail; kana still separates ja") {
    val tail = " see http example com index html page item list next prev"
    // 4x CJK weight: 26 hanzi outvote 50+ Latin letters
    assert(LangId.classify("这是一个关于新闻和天气的中文文档今天晚上在北京发布的内容" + tail) === "zh")
    assert(LangId.classify("これは天気と新しいニュースについての日本語の文書です" + tail) === "ja")
    assert(LangId.classify("오늘 저녁 날씨와 새로운 소식에 관한 한국어 문서입니다" + tail) === "ko")
  }

  test("determinism: same text classifies identically across invocations") {
    val t = heldOut(4)._2
    assert((1 to 5).map(_ => LangId.classify(t)).distinct.size === 1)
  }
}
