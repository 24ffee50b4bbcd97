package graft.functions

import org.apache.spark.sql.SparkSession

/** Gap-fill functions with genuinely imperative bodies — the short tail of
  * the reference's scalar surface that no Catalyst expression composition
  * covers (SURVEY.md §7.2 step 3). Registered as Scala UDFs: they sit
  * outside whole-stage codegen, which is acceptable because none of them
  * appears on a benchmark hot path; everything hot is a native rewrite in
  * [[Rewrites]].
  */
object Udfs {

  /** Unicode normalization — reference operator/scalar/StringFunctions.java
    * `normalize(string, form)`; forms NFC/NFD/NFKC/NFKD.
    */
  private def normalize(s: String, form: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form.toUpperCase))

  /** HMAC family — reference operator/scalar/HmacFunctions.java (hmac_md5/
    * sha1/sha256/sha512 over varbinary); hex-string output to match our
    * sha2/md5 convention.
    */
  private def hmac(algo: String)(key: Array[Byte], data: Array[Byte]): String = {
    if (key == null || data == null) return null
    val mac = javax.crypto.Mac.getInstance(algo)
    mac.init(new javax.crypto.spec.SecretKeySpec(key, algo))
    mac.doFinal(data).map("%02x".format(_)).mkString
  }

  /** Character-level Hamming distance — StringFunctions.java
    * `hamming_distance`; errors on length mismatch like the reference.
    */
  private def hammingDistance(a: String, b: String): java.lang.Long = {
    if (a == null || b == null) return null
    require(a.length == b.length, "hamming_distance: strings must have the same length")
    var i = 0; var d = 0L
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }

  /** n-combinations of an array — ArrayCombinationsFunction.java; bounded
    * like the reference (n <= 5) to keep output size sane.
    */
  private def combinations(arr: Seq[String], n: Int): Seq[Seq[String]] = {
    if (arr == null) return null
    require(n >= 0 && n <= 5, "combinations: n must be in [0, 5]")
    arr.combinations(n).toSeq
  }

  /** IEEE-754 big-endian encodings — VarbinaryFunctions.java
    * to_ieee754_64/from_ieee754_64 (and 32-bit variants).
    */
  /** Big-endian int64 codecs — VarbinaryFunctions.java
    * to_big_endian_64/from_big_endian_64 (+32-bit variants).
    */
  private def toBigEndian64(x: java.lang.Long): Array[Byte] =
    if (x == null) null
    else java.nio.ByteBuffer.allocate(8).putLong(x).array()
  private def fromBigEndian64(b: Array[Byte]): java.lang.Long =
    if (b == null) null
    else java.nio.ByteBuffer.wrap(b).getLong
  private def toBigEndian32(x: java.lang.Integer): Array[Byte] =
    if (x == null) null
    else java.nio.ByteBuffer.allocate(4).putInt(x).array()
  private def fromBigEndian32(b: Array[Byte]): java.lang.Integer =
    if (b == null) null
    else java.nio.ByteBuffer.wrap(b).getInt

  /** Standard-normal CDF via erf (Abramowitz & Stegun 7.1.26-class
    * approximation through java's tanh-free erf series is not in stdlib;
    * use the complementary-error continued expansion below, |err| < 1e-12
    * — reference: MathFunctions.java normal_cdf/inverse_normal_cdf.
    */
  private def erf(x: Double): Double = {
    // Numerical Recipes erfc with Chebyshev fitting, |relative err| ~ 1.2e-7;
    // adequate for CDF work and monotone
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
      t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) 1.0 - ans else ans - 1.0
  }

  private def normalCdf(mean: Double, sd: Double, x: Double): Double =
    0.5 * (1.0 + erf((x - mean) / (sd * math.sqrt(2.0))))

  /** Acklam's rational approximation for the probit function,
    * |relative err| < 1.15e-9 (the standard public algorithm).
    */
  private def inverseNormalCdf(mean: Double, sd: Double, p: Double): Double = {
    require(p > 0 && p < 1, "inverse_normal_cdf: p must be in (0, 1)")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
    val pLow = 0.02425
    val z =
      if (p < pLow) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      } else if (p <= 1 - pLow) {
        val q = p - 0.5
        val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log(1 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      }
    mean + sd * z
  }

  /** Regularized incomplete beta I_x(a,b) by Lentz continued fraction
    * (Numerical Recipes betacf/betai — the standard public algorithm);
    * powers beta_cdf / inverse_beta_cdf (MathFunctions.java).
    */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val MaxIt = 200; val Eps = 3e-12; val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= MaxIt) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) return h
      m += 1
    }
    h
  }

  private def lnGamma(x: Double): Double = {
    // Lanczos approximation (g=7, n=9), |err| < 1e-13
    val g = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    else {
      val z = x - 1.0
      var a = g(0)
      var i = 1
      while (i < 9) { a += g(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  private def regIncompleteBeta(a: Double, b: Double, x: Double): Double = {
    require(a > 0 && b > 0, "beta_cdf: shape parameters must be positive")
    require(x >= 0 && x <= 1, "beta_cdf: value must be in [0, 1]")
    if (x == 0.0 || x == 1.0) x
    else {
      val bt = math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
        a * math.log(x) + b * math.log(1.0 - x))
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
      else 1.0 - bt * betacf(b, a, 1.0 - x) / b
    }
  }

  private def inverseBetaCdf(a: Double, b: Double, p: Double): Double = {
    require(p >= 0 && p <= 1, "inverse_beta_cdf: p must be in [0, 1]")
    // monotone bisection — 80 iterations gives ~1e-24 interval width
    var lo = 0.0; var hi = 1.0
    var i = 0
    while (i < 80) {
      val mid = (lo + hi) / 2
      if (regIncompleteBeta(a, b, mid) < p) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2
  }

  private def toIeee754_64(x: java.lang.Double): Array[Byte] =
    if (x == null) null
    else java.nio.ByteBuffer.allocate(8).putLong(java.lang.Double.doubleToLongBits(x)).array()
  private def fromIeee754_64(b: Array[Byte]): java.lang.Double =
    if (b == null) null
    else java.lang.Double.longBitsToDouble(java.nio.ByteBuffer.wrap(b).getLong)
  private def toIeee754_32(x: java.lang.Float): Array[Byte] =
    if (x == null) null
    else java.nio.ByteBuffer.allocate(4).putInt(java.lang.Float.floatToIntBits(x)).array()
  private def fromIeee754_32(b: Array[Byte]): java.lang.Float =
    if (b == null) null
    else java.lang.Float.intBitsToFloat(java.nio.ByteBuffer.wrap(b).getInt)

  /** N-th occurrence position for 3-arg strpos (StringFunctions.java
    * stringPosition with instance): 1-based, 0 when absent, negative
    * instance counts from the end; occurrences may overlap.
    */
  private def strposInstance(s: String, sub: String, instance: java.lang.Long): java.lang.Long = {
    if (s == null || sub == null || instance == null) return null
    val inst = instance.toInt
    require(inst != 0, "strpos: instance must not be zero")
    if (sub.isEmpty) return 1L
    if (inst > 0) {
      var idx = -1
      var from = 0
      var count = 0
      while (count < inst) {
        idx = s.indexOf(sub, from)
        if (idx < 0) return 0L
        from = idx + 1
        count += 1
      }
      idx + 1L
    } else {
      var idx = 0
      var searchFrom = s.length
      var count = 0
      while (count < -inst) {
        idx = s.lastIndexOf(sub, searchFrom)
        if (idx < 0) return 0L
        searchFrom = idx - 1
        count += 1
      }
      idx + 1L
    }
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("strpos_instance", strposInstance _)
    spark.udf.register("normalize", (s: String, f: String) => normalize(s, Option(f).getOrElse("NFC")))
    spark.udf.register("word_stem", (s: String) => if (s == null) null else PorterStemmer.stem(s))
    spark.udf.register("hamming_distance", hammingDistance _)
    spark.udf.register("combinations", combinations _)
    spark.udf.register("hmac_md5", hmac("HmacMD5") _)
    spark.udf.register("hmac_sha1", hmac("HmacSHA1") _)
    spark.udf.register("hmac_sha256", hmac("HmacSHA256") _)
    spark.udf.register("hmac_sha512", hmac("HmacSHA512") _)
    spark.udf.register("to_big_endian_64", toBigEndian64 _)
    spark.udf.register("from_big_endian_64", fromBigEndian64 _)
    spark.udf.register("to_big_endian_32", toBigEndian32 _)
    spark.udf.register("from_big_endian_32", fromBigEndian32 _)
    spark.udf.register("normal_cdf", normalCdf _)
    spark.udf.register("inverse_normal_cdf", inverseNormalCdf _)
    spark.udf.register("beta_cdf", (a: Double, b: Double, x: Double) => regIncompleteBeta(a, b, x))
    spark.udf.register("inverse_beta_cdf", inverseBetaCdf _)
    spark.udf.register("to_ieee754_64", toIeee754_64 _)
    spark.udf.register("from_ieee754_64", fromIeee754_64 _)
    spark.udf.register("to_ieee754_32", toIeee754_32 _)
    spark.udf.register("from_ieee754_32", fromIeee754_32 _)
  }
}

/** Porter's stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — the classic public description).
  * Reference exposes `word_stem` via a stemmer library
  * (operator/scalar/WordStemFunction.java); this is an independent
  * implementation of the published algorithm.
  */
object PorterStemmer {

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of the [C](VC)^m[V] decomposition. */
  private def measure(w: String): Int = {
    var m = 0; var i = 0
    while (i < w.length && !isVowel(w, i)) i += 1
    while (i < w.length) {
      while (i < w.length && isVowel(w, i)) i += 1
      if (i < w.length) { m += 1; while (i < w.length && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def hasVowel(w: String): Boolean = w.indices.exists(isVowel(w, _))
  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) && !isVowel(w, w.length - 1)
  /** *o: stem ends cvc where final c is not w, x or y. */
  private def endsCvc(w: String): Boolean =
    w.length >= 3 && !isVowel(w, w.length - 3) && isVowel(w, w.length - 2) &&
      !isVowel(w, w.length - 1) && !"wxy".contains(w.charAt(w.length - 1))

  def stem(word: String): String = {
    var w = word.toLowerCase
    if (w.length <= 2) return w

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    if (w.endsWith("eed")) { if (measure(w.dropRight(3)) > 0) w = w.dropRight(1) }
    else {
      val trimmed =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      trimmed.foreach { t =>
        w = t
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (endsDoubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
        else if (measure(w) == 1 && endsCvc(w)) w += "e"
      }
    }

    // Step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2 (m>0 suffix maps)
    val step2 = List(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      val stem0 = w.dropRight(suf.length)
      if (measure(stem0) > 0) w = stem0 + rep
    }

    // Step 3
    val step3 = List(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      val stem0 = w.dropRight(suf.length)
      if (measure(stem0) > 0) w = stem0 + rep
    }

    // Step 4 (m>1 suffix drops)
    val step4 = List(
      "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
      "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou")
    step4.find(w.endsWith).foreach { suf =>
      val stem0 = w.dropRight(suf.length)
      if (measure(stem0) > 1) w = stem0
    }
    if (w.endsWith("ion") && w.length > 3 && "st".contains(w.charAt(w.length - 4))
        && measure(w.dropRight(3)) > 1) w = w.dropRight(3)

    // Step 5a
    if (w.endsWith("e")) {
      val stem0 = w.dropRight(1)
      val m = measure(stem0)
      if (m > 1 || (m == 1 && !endsCvc(stem0))) w = stem0
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l")) w = w.dropRight(1)

    w
  }
}
