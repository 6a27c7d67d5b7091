package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHashWinnow
import graft.operators.TextMetrics

class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantees a shared fingerprint for shared substrings >= w+k-1") {
    // two documents sharing a 64-char run (> w + k - 1 = 23) must share
    // at least one winnowed fingerprint (Schleimer et al., SIGMOD'03)
    val shared = "the quick brown fox jumps over the lazy dog again and again ok"
    val df = Seq(
      (1L, s"prefix one $shared trailing text here"),
      (2L, s"completely different opening $shared and another ending")).toDF("id", "text")
    val fps = df.select(col("id"), RollingHashWinnow.winnowFingerprint(col("text"), 8, 16).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "no shared fingerprint for a shared 63-char substring")
  }

  test("tokens (HOF-free form) equals the filter form on real docs and edge cases") {
    import graft.functions.tokens
    val filterForm = (c: org.apache.spark.sql.Column) =>
      filter(split(regexp_replace(lower(c), "[^\\p{L}\\p{Nd}\\s]", " "), "\\s+"),
        t => length(t) > 0)
    val edge = Seq("", "   ", "!!!", " a  b ", "a", "--x--", "café olé!",
      "\ttab\nnewline ", "vtab\fformfeed\r", "。中文字。").toDF("text")
    val real = sources.Tables.load(spark, sf, "documents").select("text").limit(200)
    for (d <- Seq(edge, real)) {
      val diff = d.select(tokens(col("text")).as("a"), filterForm(col("text")).as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(diff == 0, "HOF-free tokens diverged from the filter form")
    }
  }

  test("bm25 matches the hand-computed Robertson weights on a tiny corpus") {
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian durian durian")).toDF("id", "text")
    val got = TextMetrics.bm25(df, col("id"), col("text"), Seq("apple", "banana"))
      .as[(Long, Double)].collect().toMap
    // reference: the same formula in plain Scala, identical truncation
    val (k1, b) = (1.2, 0.75)
    val nDocs = 3L; val avgdl = 8L.toDouble / 3L.toDouble
    def idf(dfT: Long): Double = math.log(1.0 + (nDocs - dfT + 0.5) / (dfT + 0.5))
    def w(dfT: Long, tf: Long, dl: Long): Double =
      math.floor(idf(dfT) * (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * dl / avgdl)) * 1e7) / 1e7
    def score(ws: Seq[Double]): Double =
      // mirror the decimal(28,7) cast: half-up to 7 dp, exact sum
      math.floor(
        ws.map(BigDecimal(_).setScale(7, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
          * 1e4) / 1e4
    val expected = Map(
      1L -> score(Seq(w(1, 2, 3), w(2, 1, 3))), // apple tf=2, banana tf=1
      2L -> score(Seq(w(2, 1, 2)))) // banana tf=1; doc 3 has no query term
    assert(got == expected, s"got $got expected $expected")
  }

  test("urlDomains extracts lowercase hosts; non-URL text yields none") {
    val df = Seq(
      (1L, "visit https://Example.COM/page then http://a.b.org:8080/x ok"),
      (2L, "no urls at all"),
      (3L, "bare https://single.host")).toDF("id", "text")
    val got = df.select(col("id"), TextMetrics.urlDomains(col("text")).as("d"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("example.com", "a.b.org:8080"))
    assert(got(2L).isEmpty)
    assert(got(3L) == Seq("single.host"))
  }

  test("winnowing fingerprints are deterministic and non-empty on real docs") {
    val d = sources.Tables.load(spark, sf, "documents").limit(50)
    val twice = d.select(
      RollingHashWinnow.winnowFingerprint(col("text")).as("a"),
      RollingHashWinnow.winnowFingerprint(col("text")).as("b"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(twice.forall { case (a, b) => a == b && a.nonEmpty })
  }

  test("winnowPairs pairs documents sharing a long run, not unrelated ones") {
    val shared = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, s"first document begins here $shared and then ends"),
      (2L, s"second doc other opening $shared closing words differ"),
      (3L, "totally unrelated content about distributed query engines and shuffles"))
      .toDF("id", "text")
    val pairs = graft.operators.Dedup.winnowPairs(df, col("id"), col("text"), minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"shared-run pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $pairs")
  }

  test("langId prefers the language whose markers dominate") {
    val df = Seq(
      (1L, "the cat and the dog of the house is that it for"),
      (2L, "el perro y la casa de los gatos con una que y"),
      (3L, "xyzzy qwerty asdf")).toDF("doc_id", "text")
    val out = TextMetrics.withLangId(df, col("text"))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("withScripts counts per-script characters and picks the dominant script") {
    val df = Seq(
      (1L, "hello world"),                 // latin only
      (2L, "привет мир"),                  // cyrillic only
      (3L, "hello мир 你好"),              // mixed: 10 latin? no — 5 latin, 3 cyr, 2 han
      (4L, "12345 !!!"),                   // no script chars at all
      (5L, "καλημέρα")                     // greek
    ).toDF("id", "t")
    val out = TextMetrics.withScripts(df, col("t"))
      .select($"id", $"n_latin", $"n_cyrillic", $"n_han", $"dominant_script")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 10L, 0L, 0L, "latin")), out(1L).toString)
    assert(out(2L) == ((2L, 0L, 9L, 0L, "cyrillic")), out(2L).toString)
    assert(out(3L) == ((3L, 5L, 3L, 2L, "latin")), out(3L).toString)
    assert(out(4L) == ((4L, 0L, 0L, 0L, "und")), out(4L).toString)
    assert(out(5L)._5 == "greek", out(5L).toString)
  }

  test("quality score rewards in-range token stats") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then it runs off"),
      (2L, "a b c")).toDF("doc_id", "text")
    val q = TextMetrics.withQuality(df, col("text"))
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L), s"expected doc 1 to outscore doc 2: $q")
  }

  test("chunkTokens: full coverage, correct overlap, short tail, empty docs dropped") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "only three tokens"),
      (3L, "...")                            // zero tokens after normalization
    ).toDF("id", "text")
    val out = TextMetrics.chunkTokens(df, col("id"), col("text"), chunkSize = 4, stride = 2)
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 3 emits nothing
    assert(!out.exists(_._1 == 3L))
    // doc 1: starts 0,2,4,6,8 -> five chunks, last one short
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2, 3, 4))
    assert(d1.head._3 == "t0 t1 t2 t3" && d1(1)._3 == "t2 t3 t4 t5")
    assert(d1.last._3 == "t8 t9" && d1.last._4 == 2L)
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 4L, 2L))
    // every token index appears in some chunk (coverage)
    val covered = d1.flatMap(c => c._3.split(" ")).toSet
    assert(covered == (0 until 10).map(i => s"t$i").toSet)
    // doc 2: 3 tokens -> starts 0,2 -> chunks of 3 and 1 tokens
    val d2 = out.filter(_._1 == 2L)
    assert(d2.map(_._4).toSeq == Seq(3L, 1L))
  }

  test("unigramLogProb scores in-distribution docs above out-of-distribution ones") {
    val df = Seq(
      (1L, "the cat sat on the mat and the dog sat on the rug"),
      (2L, "the dog sat on the mat and the cat lay on the rug"),
      (3L, "zqxv wvup kjhn qpoe mlkz")).toDF("id", "text")
    val out = TextMetrics.unigramLogProb(df, col("id"), col("text"))
      .select("id", "n_tokens", "avg_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // docs 1/2 share the corpus' common vocabulary; doc 3 is all
    // singletons and must score strictly lower
    assert(out(3L)._3 < out(1L)._3 && out(3L)._3 < out(2L)._3, s"got $out")
    assert(out(1L)._2 == 13L)
    // deterministic across re-runs (decimal sums are order-independent)
    val rerun = TextMetrics.unigramLogProb(df, col("id"), col("text"))
      .select("id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(out.forall { case (k, (_, _, v)) => rerun(k) == v })
  }

  test("perplexityBuckets: gibberish lands in its language's worst tier, per-language split") {
    // two languages, 4 docs each: three in-distribution, one gibberish
    // per language; with nBuckets=2 each language halves independently
    // and the gibberish doc must sit in its OWN language's bucket 2
    val en = "the cat and the dog sat in the house for a day"
    val es = "el perro y la casa de los gatos con una mesa"
    val df = Seq(
      (1L, en), (2L, en + " and it is that"), (3L, en + " of the cat"),
      (4L, "the zqxv wvup kjhn qpoe mlkz vvqq jjxx"), // en markers + gibberish
      (11L, es), (12L, es + " que las por"), (13L, es + " de la casa"),
      (14L, "el zzz qqq vvv www xxx yyy uuu")).toDF("id", "text")
    val out = TextMetrics.perplexityBuckets(df, col("id"), col("text"), nBuckets = 2)
      .select("id", "lang", "bucket").as[(Long, String, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(4L)._2 == "en" && out(14L)._2 == "es", s"langid: $out")
    assert(out(4L)._3 == 2, s"en gibberish must be in the worst en tier: ${out(4L)}")
    assert(out(14L)._3 == 2, s"es gibberish must be in the worst es tier: ${out(14L)}")
    assert(out(1L)._3 == 1 && out(11L)._3 == 1,
      s"clean docs lead their language: ${out(1L)} ${out(11L)}")
    // per-language quotas: each language splits 2/2 with nBuckets=2
    val byLang = out.values.groupBy(_._2).view.mapValues(_.map(_._3).toSeq.sorted)
    assert(byLang("en") == Seq(1, 1, 2, 2) && byLang("es") == Seq(1, 1, 2, 2),
      s"per-language ntile quotas: $byLang")
  }

  test("dsirWeights: target-like docs score positive, off-distribution docs negative; hashed variant agrees") {
    // target = docs 1-3 (clean English); raw pool adds doc 4 (same
    // distribution, should be pulled UP) and docs 5-6 (gibberish,
    // should be pushed DOWN below zero)
    val en = "the cat and the dog sat in the house for a day"
    val df = Seq(
      (1L, en, true), (2L, en + " and it is that", true), (3L, en + " of the cat", true),
      (4L, "the dog and the cat sat in a house", false),
      (5L, "zqxv wvup kjhn qpoe mlkz vvqq jjxx", false),
      (6L, "qq ww ee rr tt yy uu ii oo pp", false)).toDF("id", "text", "tgt")
    val out = TextMetrics.dsirWeights(df, col("id"), col("text"), col("tgt"))
      .select("id", "avg_log_ratio", "selected").as[(Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(4L)._3, s"in-distribution non-target doc must be selected: ${out(4L)}")
    assert(!out(5L)._3 && !out(6L)._3, s"gibberish must not be selected: ${out(5L)} ${out(6L)}")
    assert(out(4L)._2 > out(5L)._2, "target-like must outrank gibberish")
    // hashed features (b large enough that collisions are unlikely on
    // this vocab) preserve the separation
    val hashed = TextMetrics.dsirWeights(df, col("id"), col("text"), col("tgt"),
        hashBuckets = Some(1 << 20))
      .select("id", "selected").as[(Long, Boolean)].collect().toMap
    assert(hashed(4L) && !hashed(5L) && !hashed(6L), s"hashed variant separation: $hashed")
  }

  test("linearTextScore: hand-computed logits, OOV contributes zero, exact-decimal decision flag") {
    val w = Seq("spark" -> 2.5, "window" -> 1.5, "slow" -> -2.0).toDF("term", "weight")
    val docs = Seq(
      (1L, "good spark window"),   // z = -0.5 + 2.5 + 1.5 = 3.5
      (2L, "slow slow spark"),     // z = -0.5 - 2.0 - 2.0 + 2.5 = -2.0
      (3L, "nothing matches here") // z = -0.5, all OOV
    ).toDF("id", "text")
    val out = TextMetrics.linearTextScore(docs, col("id"), col("text"),
        w, col("term"), col("weight"), bias = -0.5)
      .select("id", "n_tokens", "n_hits", "score", "positive")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    assert(out(1L)._2 == 3 && out(1L)._3 == 2 && out(1L)._5, s"${out(1L)}")
    assert(math.abs(out(1L)._4 - sig(3.5)) < 1e-4, s"${out(1L)}")
    assert(out(2L)._3 == 3 && !out(2L)._5, s"${out(2L)}")
    assert(math.abs(out(2L)._4 - sig(-2.0)) < 1e-4, s"${out(2L)}")
    assert(out(3L)._3 == 0 && !out(3L)._5, s"OOV-only doc scores the bias: ${out(3L)}")
    assert(math.abs(out(3L)._4 - sig(-0.5)) < 1e-4, s"${out(3L)}")
  }

  test("canonicalizeUrl merges renditions, keeps real distinctions, passes through non-URLs") {
    val cases = Seq(
      // renditions of one page → one canonical form
      "https://WWW.Example.COM/path/?utm_source=x&b=2&a=1#frag" ->
        "https://www.example.com/path?a=1&b=2",
      "https://www.example.com:443/path?a=1&b=2" ->
        "https://www.example.com/path?a=1&b=2",
      "https://www.example.com/path?b=2&a=1&gclid=zz&fbclid=q&msclkid=m&ref=r" ->
        "https://www.example.com/path?a=1&b=2",
      "HTTP://Host.ORG:80/x/y/" -> "http://host.org/x/y",
      // distinctions that must SURVIVE
      "https://host.org:8443/x" -> "https://host.org:8443/x",   // non-default port
      "https://host.org/X" -> "https://host.org/X",             // path case
      "https://host.org/x?a=1" -> "https://host.org/x?a=1",     // param value
      "https://host.org/x?a=2" -> "https://host.org/x?a=2",
      // utm param value containing '=' still dropped; 'refresh' is NOT 'ref'
      "https://host.org/x?utm_a=b=c&refresh=1" -> "https://host.org/x?refresh=1",
      // not absolute URLs → trimmed pass-through
      "  not a url  " -> "not a url",
      "relative/path?utm_source=x" -> "relative/path?utm_source=x")
    val out = cases.map(_._1).toDF("url")
      .select(TextMetrics.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect()
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got === want, s"expected $want, got $got")
    }
  }

  test("bigramLogProb penalizes scrambled word order that the unigram model cannot see") {
    // same token MULTISET in every doc — unigram-identical by
    // construction; only the bigram model can tell them apart
    val natural = "the quick brown fox jumps over the lazy dog " * 4
    val scrambled = "dog the over quick jumps lazy the brown fox " +
      "fox the dog brown lazy over jumps quick the " +
      "jumps dog the brown over fox the quick lazy " +
      "lazy brown the fox quick dog over the jumps"
    val df = Seq((1L, natural), (2L, natural), (3L, natural), (4L, scrambled))
      .toDF("id", "text")
    val out = TextMetrics.bigramLogProb(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // every doc has 9*4 = 36 tokens -> 35 bigram positions
    assert(out.values.forall(_._1 == 35L))
    assert(out(1)._2 == out(2)._2, "identical docs must score identically")
    assert(out(1)._2 > out(4)._2,
      s"natural order ${out(1)._2} must beat scrambled ${out(4)._2}")
  }

  test("bigramLogProb drops docs with fewer than two tokens") {
    val df = Seq((1L, "one"), (2L, ""), (3L, "two words here")).toDF("id", "text")
    val ids = TextMetrics.bigramLogProb(df, col("id"), col("text"))
      .select("id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("knBigramLogProb: hand-computed KN probabilities; continuation beats raw frequency") {
    // corpus: d1 "a b a b", d2 "c b" →
    //   cb: (a,b)=2 (b,a)=1 (c,b)=1; ctx a:(np2,nf1) b:(1,1) c:(1,1)
    //   cont: b←{a,c}=2, a=1; N1+(··)=3
    //   p(b|a)=1.25/2 + .75·(1/2)·(2/3)=0.875; p(a|b)=0.25+0.25=0.5
    //   p(b|c)=0.25 + .75·(2/3)=0.75
    val df = Seq((1L, "a b a b"), (2L, "c b")).toDF("id", "text")
    val out = TextMetrics.knBigramLogProb(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r7(x: Double) = BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = (2 * r7(math.log(0.875)) + r7(math.log(0.5))) / 3
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L, out.toString)
    assert(math.abs(out(1L)._2 - exp1) < 1e-4, s"${out(1L)._2} vs $exp1")
    assert(math.abs(out(2L)._2 - r7(math.log(0.75))) < 1e-4, out.toString)
    // the KN signature: a word frequent only inside one collocation
    // gets a LOW continuation weight — "francisco" appears 4 times
    // (as often as "dog") but always after "san", so a bigram ending
    // in fresh-context "dog" outscores one ending in "francisco"
    // under the same unseen-context backoff
    val kn = Seq(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "red dog blue dog green dog gray dog"),
      (3L, "walk dog"), (4L, "walk francisco")).toDF("id", "text")
    val s = TextMetrics.knBigramLogProb(kn, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(3L) > s(4L),
      s"continuation backoff must prefer dog (${s(3L)}) over francisco (${s(4L)})")
  }

  test("goodTuring: hand-computed frequency classes, adjusted counts, unseen mass") {
    // "a a a b b c": N1=N2=N3=1, N=6 → r*(1)=2, r*(2)=3, r*(3)=NULL,
    // p_unseen = 1/6 floored at 6 dp
    val df = Seq((1L, "a a a b b c")).toDF("id", "text")
    val out = TextMetrics.goodTuring(df, col("text")).orderBy("r").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L))
    assert(out(0).getDouble(3) == 2.0 && out(1).getDouble(3) == 3.0)
    assert(out(2).isNullAt(3), out(2).toString)
    assert(out.forall(_.getDouble(4) == math.floor(1.0 / 6.0 * 1e6) / 1e6))
    assert(out.forall(_.getLong(5) == 6L))
    // empty corpus: no classes, no rows (nothing to estimate)
    val e = TextMetrics.goodTuring(Seq((1L, "")).toDF("id", "text"), col("text"))
    assert(e.count() == 0L)
  }

  test("pseudonymize: consistent identity-preserving tokens, no re-matching, pass-through") {
    val df = Seq(
      (1L, "mail a@b.com and a@b.com twice, ref 12345678"),
      (2L, "same a@b.com other c@d.net"),
      (3L, "no pii here at all"),
      (4L, "a@b.com")).toDF("id", "t")
    val out = df.select(col("id"),
        TextMetrics.pseudonymize(col("t")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val tok = "<EMAIL:[a-p]{8}>".r
    // same address -> same token, within AND across docs
    val t1 = tok.findAllIn(out(1L)).toSeq
    assert(t1.size == 2 && t1.distinct.size == 1, out(1L))
    val t2 = tok.findAllIn(out(2L)).toSeq
    assert(t2.size == 2 && t2.distinct.size == 2, out(2L))
    assert(t2.head == t1.head, "a@b.com must map identically across docs")
    // digit run pseudonymized with its own type; letters-only hex
    // means the EMAIL token can never re-match the NUM pass
    assert(out(1L).contains("<NUM:") && !out(1L).contains("12345678"), out(1L))
    // no matches: byte-identical pass-through
    assert(out(3L) == "no pii here at all")
    // whole-string match: nothing but the token remains
    assert(tok.pattern.matcher(out(4L)).matches, out(4L))
  }

  test("dropBlockedDomains: suffix blocks subdomains, exact host blocks only itself") {
    val docs = Seq(
      (1L, "link http://ads.bad-ads.com/x"),       // subdomain of blocked suffix
      (2L, "link https://bad-ads.com/y"),          // exact blocked suffix
      (3L, "link https://bad-ads.com.evil.io/z"),  // NOT a suffix match (labels differ)
      (4L, "link https://cdn.example.net/ok"),     // exact-host entry blocks this host
      (5L, "link https://www.cdn.example.net/ok"), // subdomain of that entry -> also blocked
      (6L, "link https://example.net/ok"),         // parent of the exact-host entry survives
      (7L, "no urls at all")).toDF("id", "text")
    val blk = Seq("bad-ads.com", "cdn.example.net").toDF("domain")
    val kept = TextMetrics.dropBlockedDomains(docs, col("id"), col("text"),
        blk, col("domain"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 6L, 7L), s"got $kept")
  }

  test("stripAccents folds diacritics, preserves case, leaves non-decomposables alone") {
    import graft.functions.UnicodeNormalize.stripAccents
    val out = Seq(
      (1L, "ação ELÉTRICA café"),
      (2L, "cafe\u0301"), // ALREADY-decomposed combining-mark input
      (3L, "høj łódź"))         // ø and ł do not decompose: accent removal, not transliteration
      .toDF("id", "t")
      .select($"id", stripAccents($"t").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "acao ELETRICA cafe")
    assert(out(2L) == "cafe")
    assert(out(3L) == "høj łodz")
  }

  test("UnicodeNormalize composes, folds compatibility forms, and is idempotent") {
    import spark.implicits._
    import graft.functions.UnicodeNormalize.{nfc, nfkc}
    // NFC: decomposed e+U+0301 composes; NFKC additionally folds the
    // fi-ligature U+FB01 and fullwidth A U+FF21 to ASCII
    val df = Seq(
      (1L, "cafe\u0301"),
      (2L, "\ufb01ne \uff21"),
      (3L, "already plain"),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val out = df.select($"id", nfc($"s").as("c"), nfkc($"s").as("k"))
      .orderBy("id").as[(Long, String, String)].collect()
    assert(out(0)._2 == "caf\u00e9" && out(0)._2.length == 4)
    assert(out(0)._3 == "caf\u00e9")
    assert(out(1)._2 == "\ufb01ne \uff21", "NFC must NOT fold compatibility chars")
    assert(out(1)._3 == "fine A", "NFKC must fold ligature and fullwidth")
    assert(out(2)._2 == "already plain" && out(2)._3 == "already plain")
    assert(out(3)._2 == null && out(3)._3 == null)
    // idempotent: normalizing twice changes nothing (the isNormalized
    // fast path covers the second pass)
    val twice = df.filter($"s".isNotNull)
      .select(nfc(nfc($"s")).as("a"), nfc($"s").as("b"))
      .filter($"a" =!= $"b").count()
    assert(twice == 0)
    // normalization makes the composed/decomposed renditions of the
    // same visible text hash-equal — the dedup-relevant property
    val fp = Seq(("cafe\u0301"), ("caf\u00e9")).toDF("s")
      .select(org.apache.spark.sql.functions.md5(nfc($"s")).as("h"))
      .as[String].collect().toSet
    assert(fp.size == 1)
  }

  test("compressionRatio separates repetitive from incompressible text") {
    // repetitive: one sentence repeated 50\u00d7; incompressible: md5 hex
    // chains (no structure for DEFLATE to exploit); empty: ratio 1.0
    val repeated = Seq.fill(50)("the same boilerplate sentence repeats forever").mkString(" ")
    val junk = (0 until 50).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"seed$i".getBytes("UTF-8")).map("%02x".format(_)).mkString).mkString(" ")
    val df = Seq((1L, repeated), (2L, junk), (3L, "")).toDF("id", "text")
    val out = TextMetrics.withCompressionRatio(df, $"text")
      .select($"id", $"octet_len", $"deflate_len", $"compress_ratio")
      .orderBy("id").as[(Long, Long, Long, Double)].collect()
    assert(out(0)._4 < 0.1, s"repeated text should compress hard, got ${out(0)._4}")
    assert(out(1)._4 > 0.5, s"hex junk should resist compression, got ${out(1)._4}")
    assert(out(2)._2 == 0L && out(2)._4 == 1.0, "empty doc contract")
    // determinism: the kernel is a pure function of the bytes
    val again = TextMetrics.withCompressionRatio(df, $"text")
      .select($"deflate_len").as[Long].collect()
    assert(again.toSeq == out.map(_._3).toSeq)
  }

  test("docShape: hand-computed line metrics, trimming, and empty-line drop") {
    // doc 1: 4 kept lines (a, dup, dup, '- b ...') \u2014 dup pair + one
    // bullet line that also ends with an ellipsis; whitespace-only
    // line dropped; trailing spaces trimmed before comparison
    val d1 = "alpha line\ndup line  \ndup line\n- b ...\n   \n"
    // doc 2: all distinct, no formatting markers
    val d2 = "one\ntwo\nthree"
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val out = TextMetrics.docShape(df, $"doc_id", $"text")
      .orderBy("id")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    val (_, n1, nd1, dupL1, dupC1, bul1, ell1) = out(0)
    assert(n1 == 4 && nd1 == 3)
    assert(dupL1 == 0.25) // 1 of 4 lines is a repeat
    // dup chars: 2\u00d7len("dup line")=16 of 10+16+7=33 total line chars
    assert(dupC1 == math.floor(16.0 / 33.0 * 10000) / 10000 ||
      dupC1 == BigDecimal(16.0 / 33.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(bul1 == 0.25 && ell1 == 0.25)
    val (_, n2, nd2, dupL2, dupC2, bul2, ell2) = out(1)
    assert(n2 == 3 && nd2 == 3 && dupL2 == 0.0 && dupC2 == 0.0 && bul2 == 0.0 && ell2 == 0.0)
  }

  test("splitSentences: terminator-aware splits, empties drop, positions order") {
    val df = Seq(
      (1L, "Hello world. How are you?! Fine..."),
      (2L, "no terminator here"),
      (3L, "! ! leading")).toDF("doc_id", "text")
    val out = TextMetrics.splitSentences(df, $"doc_id", $"text")
      .orderBy("id", "sent_pos")
      .as[(Long, Int, String)].collect()
    val d1 = out.filter(_._1 == 1L).map(_._3).toSeq
    assert(d1 == Seq("Hello world.", "How are you?!", "Fine..."))
    // positions strictly increase (gaps allowed)
    val p1 = out.filter(_._1 == 1L).map(_._2).toSeq
    assert(p1 == p1.sorted && p1.distinct == p1)
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("no terminator here"))
    // "! ! leading": the whitespace run before the second '!' carries
    // that terminator -> a punctuation-only "!" row survives (only
    // entries that trim to EMPTY drop); the leading bare '!' has no
    // non-terminator run at all and emits nothing
    assert(out.filter(_._1 == 3L).map(_._3).toSeq == Seq("!", "leading"))
  }

  test("readability: hand-computed Flesch; degenerate text reports zeros") {
    // 2 sentences, 6 words, 6 vowel groups: wps=3, spw=1,
    // flesch = 206.835 - 3.045 - 84.6 = 119.19
    val df = Seq((1L, "The cat sat. The dog ran."), (2L, ""), (3L, "...")).toDF("doc_id", "text")
    val out = TextMetrics.readability(df, $"doc_id", $"text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    val r1 = out(0)
    assert((r1._2, r1._3, r1._4) == ((2L, 6L, 6L)))
    assert(r1._5 == 3.0 && r1._6 == 1.0)
    assert(math.abs(r1._7 - 119.19) < 1e-4)
    // empty + punctuation-only docs: all zeros, no divide error
    assert(out.drop(1).forall(r => r._5 == 0.0 && r._6 == 0.0 && r._7 == 0.0))
  }

  test("mojibake: artifacts repair and count; clean text passes untouched") {
    val df = Seq((1L, "CafÃ© â€” donâ€™t say â€œno"), (2L, "plain ascii, café fine"))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextMetrics.fixMojibake($"text").as("fixed"),
        TextMetrics.mojibakeHits($"text").as("hits"))
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out(0)._2 == "Café — don’t say “no")
    assert(out(0)._3 == 4L)
    assert(out(1)._2 == "plain ascii, café fine" && out(1)._3 == 0L)
  }

  test("tokenLoops: hand-computed runs and repeat counts; empty doc reports zeros") {
    val df = Seq(
      (1L, "a b b b c c a"),   // runs: b*3, c*2 -> max 3, repeats 2+1=3
      (2L, "x y z"),           // no repeats
      (3L, "...")).toDF("doc_id", "text")
    val out = TextMetrics.tokenLoops(df, $"doc_id", $"text")
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(out(0) == ((1L, 3L, 3L)))
    assert(out(1) == ((2L, 1L, 0L)))
    assert(out(2) == ((3L, 0L, 0L)))
  }

  test("detectFormat: priority order routes ambiguous docs deterministically") {
    val df = Seq(
      (1L, """{"a": 1, "b": [2, 3]}"""),
      (2L, "<html><body><p>hi</p></body></html>"),
      (3L, "# Title\n- one\n- two\nplain after"),
      (4L, "def f() { return 1; } def g() { return 2; } import os; x = {};"),
      (5L, "just an ordinary paragraph of prose"),
      // json wins over code despite braces (priority contract)
      (6L, """{"code": "def f() { return 1; } { } ; ; ; ;"}""")).toDF("id", "t")
    val out = df.select($"id", TextMetrics.detectFormat($"t").as("f"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "json" && out(2L) == "html" && out(3L) == "markdown")
    assert(out(4L) == "code" && out(5L) == "prose" && out(6L) == "json")
  }

  test("langConsistency: glued bilingual page flags, monolingual page passes") {
    val en = "the cat and the dog of the house is that it for the and of"
    val es = "el perro y la casa de los gatos con una que de la y el mas"
    val df = Seq(
      (1L, en + " " + en),   // uniform english
      (2L, en + " " + es),   // english head, spanish tail
      (3L, "xyz qqq")).toDF("doc_id", "text")
    val out = TextMetrics.langConsistency(df, $"doc_id", $"text")
      .orderBy("id").as[(Long, String, String, Boolean)].collect()
    assert(out(0) == ((1L, "en", "en", true)))
    assert(out(1)._2 == "en" && out(1)._3 == "es" && !out(1)._4)
    assert(out(2) == ((3L, "und", "und", true)))
  }

  test("tokenizerFertility: hand-computed per-group ratios") {
    val df = Seq(
      ("a", "ab cd"),     // 5 chars, 2 ws tokens, bpe: ab|cd = 2
      ("a", "x, y"),      // 4 chars, 2 ws tokens (x y), bpe: x|,|y = 3
      ("b", "")).toDF("g", "text")
    val out = TextMetrics.tokenizerFertility(df, $"g", $"text")
      .orderBy("grp")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(out(0)._1 == "a")
    assert((out(0)._2, out(0)._3, out(0)._4, out(0)._5) == ((2L, 9L, 4L, 5L)))
    assert(out(0)._6 == math.floor(9.0 / 5.0 * 1e4) / 1e4)
    assert(out(0)._7 == math.floor(5.0 / 4.0 * 1e4) / 1e4)
    // empty-text group: zero tokens -> 0.0 ratios, no divide error
    assert(out(1) == (("b", 1L, 0L, 0L, 0L, 0.0, 0.0)))
  }

  test("gopherGate: each rule fails in isolation, per-rule flags and verdict hand-checked") {
    // text passed as a COMPUTED expression over a column NOT named __t:
    // pins the r5 regression where the caller's expression was resolved
    // against the post-projection frame (where only id/__t exist).
    val sent = "the water runs down from mountain and into valley streams "
    val docs = Seq(
      (1, sent * 6),                                      // all rules pass
      (2, sent),                                          // 10 words: r_word_count fails
      (3, "the and " + "aa " * 58),                       // mean len 122/60≈2.03: r_mean_word_len fails
      (4, "the and " + "water " * 53 + "# " * 7),         // 7 hashes / 55 words > 0.1: r_symbol_ratio fails
      (5, "the and " + "water " * 45 + "12345 " * 15),    // 47/62 alpha < 0.8: r_alpha_words fails
      (6, "water " * 60),                                 // 0 stop hits: r_stop_hits fails
      (7, "the and " + "water " * 53 + "... " * 7)        // 7 ellipses / 55 words > 0.1: r_symbol_ratio fails
    ).toDF("docid", "body")
    val out = TextMetrics.gopherGate(docs, $"docid", concat($"body", lit("")))
      .orderBy("id")
      .as[(Int, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    //               id  n_words  words  meanLen symbol alpha  stop   pass
    assert(out(0) == ((1, 60L,    true,  true,   true,  true,  true,  true)))
    assert(out(1) == ((2, 10L,    false, true,   true,  true,  true,  false)))
    assert(out(2) == ((3, 60L,    true,  false,  true,  true,  true,  false)))
    assert(out(3) == ((4, 55L,    true,  true,   false, true,  true,  false)))
    assert(out(4) == ((5, 62L,    true,  true,   true,  false, true,  false)))
    assert(out(5) == ((6, 60L,    true,  true,   true,  true,  false, false)))
    assert(out(6) == ((7, 55L,    true,  true,   false, true,  true,  false)))
  }

  test("cleanControlChars: CRLF/CR normalize, C0 strip, newline runs collapse") {
    val df = Seq((1L, "\u0000a\u0007b\r\nc\rd\n\n\n\ne\tf")).toDF("doc_id", "text")
    val out = df.select(TextMetrics.cleanControlChars($"text")).as[String].collect().head
    // NUL/BEL stripped, TAB kept, CRLF and bare CR -> LF, 4 LFs -> 2
    assert(out == "ab\nc\nd\n\ne\tf")
  }

  test("luhnValid accepts real test PANs, rejects off-by-one and junk (D73b)") {
    val cases = Seq(
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),  // checksum off by one
      ("5500005555555559", true),   // 16-digit test MC
      ("79927398713", true),        // the canonical Luhn example
      ("79927398714", false),
      ("", false),
      ("4111x11111111111", false)   // non-digit input guarded
    ).toDF("s", "want")
    val got = cases.select(col("want"),
      TextMetrics.luhnValid(col("s")).as("got")).collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("ccLuhnReport separates valid PANs from same-length invalid runs") {
    val docs = Seq(
      ("a", "pay with 4111111111111111 today"),        // valid
      ("a", "order 4111111111111112 reference"),       // 16 digits, invalid
      ("a", "no digits at all"),
      ("b", "two cards 4111111111111111 and 5500005555555559 here")
    ).toDF("src", "text")
    val out = TextMetrics.ccLuhnReport(docs, col("src"), col("text"))
      .orderBy("source").collect()
    assert(out(0).getAs[Long]("n_candidates") == 2L)
    assert(out(0).getAs[Long]("n_luhn_valid") == 1L)
    assert(out(0).getAs[Long]("docs_with_valid_cc") == 1L)
    assert(out(1).getAs[Long]("n_luhn_valid") == 2L)
    assert(out(1).getAs[Long]("docs_with_valid_cc") == 1L)
  }

  test("binaryBlobStats: run thresholds, ratio flag, huge-run flag, empty text") {
    import spark.implicits._
    val blob45 = "A" * 45
    val hex36 = "deadbeef" * 4 + "beef" // 36 hex chars
    val docs = Seq(
      (1L, s"${"prose " * 30}$blob45 and more"), // one run, ratio 45/229 < 0.3
      (2L, s"${"prose " * 25}short AAAA run, plus $hex36"), // hex counts, b64 doesn't (36 < 40); ratio 36/186 < 0.3
      (3L, blob45 + blob45), // 90 chars of blob in a 90-char doc: ratio 1 -> flagged
      (4L, ""), // empty: zeros, ratio 0
      (5L, "just prose here")) // clean
      .toDF("id", "t")
    val r = TextMetrics.binaryBlobStats(docs, col("id"), col("t"),
        hugeRun = 80)
      .orderBy("id")
      .as[(Long, Long, Long, Double, Long, Long, Double, Boolean)].collect()
    assert(r(0)._2 == 1L && r(0)._3 == 45L && !r(0)._8, s"${r(0)}")
    assert(r(1)._2 == 0L && r(1)._5 == 1L && r(1)._6 == 36L && !r(1)._8, s"${r(1)}")
    assert(r(2)._2 == 1L && r(2)._3 == 90L && r(2)._4 == 1.0 && r(2)._8, s"${r(2)}")
    assert(r(3) == ((4L, 0L, 0L, 0.0, 0L, 0L, 0.0, false)), s"${r(3)}")
    assert(r(4) == ((5L, 0L, 0L, 0.0, 0L, 0L, 0.0, false)), s"${r(4)}")
    // a digest dump of SHORT hex runs (< minB64Run, so invisible to
    // the b64 ratio) flags through the hex ratio
    val hexDump = Seq((9L, ("cafe0123" * 4 + " ") * 3 + "ok")).toDF("id", "t")
    val rh = TextMetrics.binaryBlobStats(hexDump, col("id"), col("t"))
      .as[(Long, Long, Long, Double, Long, Long, Double, Boolean)].collect()(0)
    assert(rh._2 == 0L && rh._5 == 3L && rh._6 == 32L && rh._7 > 0.3 && rh._8,
      s"$rh")
    // NULL text reads as empty, never -1 run counts
    val nulls = Seq((10L, null.asInstanceOf[String])).toDF("id", "t")
    val rn = TextMetrics.binaryBlobStats(nulls, col("id"), col("t"))
      .as[(Long, Long, Long, Double, Long, Long, Double, Boolean)].collect()(0)
    assert(rn == ((10L, 0L, 0L, 0.0, 0L, 0L, 0.0, false)), s"$rn")
  }

  test("vocabGrowth: first-seen attribution, zero-new buckets, cumulative vocab") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x y"), (0L, "x"), // bucket 0: vocab {x, y}, both new
      (1L, "y z"), // bucket 1: {y, z}, only z new
      (2L, "x")) // bucket 2: {x}, nothing new
      .toDF("b", "text")
    val r = TextMetrics.vocabGrowth(docs, col("b"), col("text"))
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(r.toSeq == Seq(
      (0L, 2L, 2L, 1.0, 2L),
      (1L, 2L, 1L, 0.5, 3L),
      (2L, 1L, 0L, 0.0, 3L)), s"got ${r.toSeq}")
  }

  test("pmiBigrams: hand-computed PMI, minCount prune, tie order, k cap") {
    import spark.implicits._
    val docs = Seq("new york new york", "new york city", "dog").toDF("text")
    val r = TextMetrics.pmiBigrams(docs, col("text"), minCount = 2, k = 10)
      .as[(String, String, Long, Double)].collect()
    // uni: new 3, york 3, city 1, dog 1 (Nu=8); bigrams Nb=5 with
    // (new,york)=3; everything else below minCount
    assert(r.length == 1)
    val exp = BigDecimal(math.log(3.0 * 8 * 8 / (5.0 * 3 * 3)))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0) == (("new", "york", 3L, exp)), s"${r(0)} vs $exp")
    // symmetric corpus: equal PMI everywhere, ties break (prev, cur),
    // k caps the list
    val sym = Seq("a b", "a b", "c d", "c d").toDF("text")
    val rs = TextMetrics.pmiBigrams(sym, col("text"), minCount = 2, k = 1)
      .as[(String, String, Long, Double)].collect()
    assert(rs.length == 1 && rs(0)._1 == "a" && rs(0)._2 == "b")
  }

  test("distinctNgramRatios: hand-counted ratios, short docs drop higher n, template collapse") {
    import spark.implicits._
    val docs = Seq(
      ("t", "a b a b"), ("t", "a b a b"), // templated: repeats collapse
      ("n", "u v w x"), // all-distinct natural text
      ("s", "z")) // single token: no bigram/trigram rows
      .toDF("src", "text")
    val r = TextMetrics.distinctNgramRatios(docs, col("src"), col("text"), maxN = 3)
      .orderBy("group_key", "n")
      .as[(String, Int, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(
      ("n", 1, 4L, 4L, 1.0), ("n", 2, 3L, 3L, 1.0), ("n", 3, 2L, 2L, 1.0),
      ("s", 1, 1L, 1L, 1.0),
      ("t", 1, 8L, 2L, 0.25), ("t", 2, 6L, 2L, 0.3333), ("t", 3, 4L, 2L, 0.5)),
      s"got ${r.toSeq}")
  }

  test("sourceDivergence: half-overlap = 1/2 exactly, identical ~0, disjoint = 1, full grid") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x x y y"), ("b", "x x z z"), // share x at p=1/2 -> JSD 1/2
      ("c", "x x y y"), // identical to a -> JSD ~0
      ("d", "q q r r")) // disjoint from a -> completion row, JSD 1
      .toDF("src", "text")
    val r = TextMetrics.sourceDivergence(docs, col("src"), col("text"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getAs[Long]("n_shared_terms"), x.getAs[Double]("jsd")))).toMap
    assert(r.size == 6, "4 sources -> 6 pairs, absent ones completed")
    // a vs b: shared term x with p=q=1/2 contributes 0; exclusive
    // masses are 1/2 each side -> JSD exactly 0.5 (p=0.5 is float-exact)
    assert(r(("a", "b")) == ((1L, 0.5)), s"${r(("a", "b"))}")
    // identical distributions: zero divergence up to 7-dp truncation
    assert(r(("a", "c"))._1 == 2L && r(("a", "c"))._2 <= 0.0001,
      s"${r(("a", "c"))}")
    // disjoint vocabularies: completed pair at the JSD ceiling
    assert(r(("a", "d"))  == ((0L, 1.0)))
    // all values in [0, 1]
    assert(r.values.forall { case (_, j) => j >= 0.0 && j <= 1.0 })
  }

  test("D139 lexicalRichness: hand frequency spectrum") {
    // corpus per group: "a a a b b c" -> N=6, V=3, hapax=1 (c),
    // sum m^2 Vm = 9 + 4 + 1 = 14, YuleK = 1e4*(14-6)/36
    val df = Seq(("s1", "a a a b b c")).toDF("src", "text")
    val r = TextMetrics.lexicalRichness(df, col("src"), col("text"))
      .select("n_tokens", "n_types", "n_hapax", "ttr", "hapax_ratio", "yule_k")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 == 6L && r._2 == 3L && r._3 == 1L)
    assert(math.abs(r._4 - 0.5) < 1e-6)
    assert(math.abs(r._5 - 1.0 / 3) < 1e-5)
    assert(math.abs(r._6 - 1e4 * 8 / 36.0) < 0.01, r.toString)
  }

  test("D140 termDispersion: concentrated term high DP, uniform term low") {
    // two sources, equal token mass (8 each). "zz" lives only in s1;
    // "aa" spreads exactly like the corpus -> DP 0.
    val df = Seq(
      ("s1", "aa aa zz zz zz zz aa aa"),
      ("s2", "aa aa aa aa bb bb bb bb")).toDF("src", "text")
    val r = TextMetrics.termDispersion(df, col("src"), col("text"), k = 10)
      .select("term", "dp_dispersion").as[(String, Double)].collect().toMap
    assert(r("zz") == 0.5, r.toString) // all in the 1/2-mass source
    assert(r("aa") < 0.17) // 6 of 8 vs the 1/2 split
  }

  test("D141 burrowsDelta: identical sources sit at zero, register shift separates") {
    val df = Seq(
      ("s1", "the cat sat on the mat and the dog ran"),
      ("s2", "the cat sat on the mat and the dog ran"),
      ("s3", "equations govern dynamics therefore theorem proofs converge"))
      .toDF("src", "text")
    val r = TextMetrics.burrowsDelta(df, col("src"), col("text"), m = 10)
      .select("source_a", "source_b", "delta")
      .as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r(("s1", "s2")) == 0.0)
    assert(r(("s1", "s3")) > 0.5, r.toString)
  }
}
