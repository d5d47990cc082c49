package graft.functions

/** Text-analysis kernels: n-gram language identification and token
  * helpers. Pure Scala (usable from Dataset ops and UDF registration).
  */
object TextFunctions {

  /** Character-trigram profiles of the most frequent trigrams per
    * language (public-knowledge frequency lists; padded word boundaries).
    * Deliberately compact — language ID at pipeline scale is a coarse
    * routing signal, not a linguistics model. */
  val Profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ",
      "ing", "ng ", " to", "to ", "ed ", " in", "ion", "on ", "tio",
      " is", "is ", "at ", "er ", " be", "es ", " re", "hat"),
    "de" -> Seq("er ", "en ", " de", "der", "ie ", " di", "die", "ch ",
      "ein", "sch", " un", "und", "nd ", "ung", " ge", "ich", "che",
      "cht", " ei", "ten", "in ", "ne ", "ber", " zu", "das"),
    "fr" -> Seq(" de", "de ", "es ", " le", "le ", "ent", "nt ", "la ",
      " la", "ion", "on ", "re ", " pa", "e d", " et", "et ", "que",
      " qu", "ue ", "les", " co", "des", "ait", "eur", " un"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", "as ",
      "es ", " en", "en ", "ión", "ent", " co", "con", "sta", "ado",
      "que", " qu", "ue ", "ar ", " es", "cio", "nte", "los"),
    "zh" -> Seq("的", "一", "是", "了", "我", "不", "人", "在", "他", "有",
      "这", "个", "上", "们", "来", "到", "时", "大", "地", "为")
  )

  /** All character n-grams of length n (with single-space padding). */
  def ngrams(text: String, n: Int): Seq[String] = {
    val t = " " + text.toLowerCase + " "
    if (t.length < n) Seq.empty
    else (0 to t.length - n).map(i => t.substring(i, i + n))
  }

  /** Detect language by trigram-profile overlap: for each language, count
    * profile trigrams present in the text (weighted by profile rank);
    * return the argmax, "und" (undetermined) when nothing matches. */
  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val grams = ngrams(text, 3).toSet ++ text.toSeq.map(_.toString).toSet
    var best = "und"
    var bestScore = 0.0
    for ((lang, profile) <- Profiles.toSeq.sortBy(_._1)) {
      var score = 0.0
      var rank = 0
      for (g <- profile) {
        if (grams.contains(g)) score += profile.size - rank
        rank += 1
      }
      if (score > bestScore) { bestScore = score; best = lang }
    }
    best
  }
}
