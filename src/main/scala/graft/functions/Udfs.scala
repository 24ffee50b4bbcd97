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

  def register(spark: SparkSession): Unit = {
    spark.udf.register("normalize", (s: String, f: String) => normalize(s, Option(f).getOrElse("NFC")))
    spark.udf.register("word_stem", (s: String) => if (s == null) null else PorterStemmer.stem(s))
    spark.udf.register("hamming_distance", hammingDistance _)
    spark.udf.register("combinations", combinations _)
    spark.udf.register("hmac_md5", hmac("HmacMD5") _)
    spark.udf.register("hmac_sha1", hmac("HmacSHA1") _)
    spark.udf.register("hmac_sha256", hmac("HmacSHA256") _)
    spark.udf.register("hmac_sha512", hmac("HmacSHA512") _)
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
