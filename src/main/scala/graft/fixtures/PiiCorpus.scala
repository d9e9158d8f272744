package graft.fixtures

/** Deterministic corpus for the PII-redaction surface (x30): each line is
  * composed of benign words with KNOWN PII tokens (emails, +CC phone
  * numbers, IPv4s) inserted at generation time, and the expected redacted
  * line is recorded AS the line is composed — generation-time truth,
  * never computed by running the redactor (the x23 pattern).
  */
object PiiCorpus {

  private val words = Array("the", "report", "was", "filed", "by", "our",
    "contact", "please", "reach", "team", "office", "support", "billing",
    "after", "before", "meeting", "notes", "updated", "records", "archive")
  private val names = Array("alice", "bob", "carol", "dave", "erin", "frank")
  private val domains = Array("example", "mailhost", "corp", "webmail")
  private val tlds = Array("com", "org", "net", "io")

  /** One line by index: (raw text, expected redacted text). */
  def lineAt(seed: Long, i: Long): (String, String) = {
    val rng = FixtureGen.rngFor(seed, i)
    val raw = new StringBuilder
    val exp = new StringBuilder
    val nTok = 8 + rng.nextInt(10)
    var t = 0
    while (t < nTok) {
      if (t > 0) { raw.append(' '); exp.append(' ') }
      rng.nextInt(10) match {
        case 0 =>
          val e = s"${names(rng.nextInt(names.length))}." +
            s"${names(rng.nextInt(names.length))}@" +
            s"${domains(rng.nextInt(domains.length))}.${tlds(rng.nextInt(tlds.length))}"
          raw.append(e); exp.append("[EMAIL]")
        case 1 =>
          val p = s"+${1 + rng.nextInt(99)}-${100 + rng.nextInt(900)}-${1000 + rng.nextInt(9000)}"
          raw.append(p); exp.append("[PHONE]")
        case 2 =>
          val ip = s"${rng.nextInt(256)}.${rng.nextInt(256)}." +
            s"${rng.nextInt(256)}.${rng.nextInt(256)}"
          raw.append(ip); exp.append("[IP]")
        case _ =>
          val w = words(rng.nextInt(words.length))
          raw.append(w); exp.append(w)
      }
      t += 1
    }
    (raw.toString, exp.toString)
  }
}
