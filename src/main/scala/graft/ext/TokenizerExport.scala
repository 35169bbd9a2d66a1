package graft.ext

import org.apache.spark.sql.SparkSession

/** Interchange-format export/import for the three trained tokenizer
  * families — the artifact a real training job consumes, in the
  * published conventions (all public formats):
  *
  *  - BPE: `merges.txt` ("#version" header, one "left right" merge per
  *    line in rank order — the GPT-2/HF convention) plus `vocab.tsv`
  *    ("sym<TAB>tid" — ids are the engine's code-point-rank discipline,
  *    tid 0 = EOS, not listed);
  *  - Unigram: `pieces.tsv` ("piece<TAB>score<TAB>count", score = the
  *    engine's integer micro-log — the SentencePiece .vocab shape with
  *    an exact fixed-point score instead of a float);
  *  - WordPiece: `vocab.txt` (one display-form piece per line in tid
  *    order, `##` prefix marking continuation pieces — the BERT/HF
  *    convention; line N (1-based) = tid N, tid 0 = EOS, not listed).
  *
  * Export is driver-side model metadata (|vocab| lines) written
  * through the Hadoop FS API (works on any cluster filesystem);
  * import parses the same bytes back into the exact model the engine
  * trains, so `import(export(m))` + freeze encodes IDENTICALLY to the
  * in-memory model — the round-trip TokenizerExportSpec pins, plus a
  * golden-file check against byte literals.
  *
  * Encoding note: the files are UTF-8. BPE merge symbols and unigram /
  * WordPiece pieces derive from corpus words (space-split), so they
  * can never contain '\n', ' ' or '\t' (symbols concatenate code
  * points of single words). The WordPiece `##` display prefix is the
  * ONE lossy spot of the published format: an INITIAL piece whose
  * surface literally starts with "##" (a corpus word starting "##…")
  * would re-import as a continuation piece — [[exportWordPiece]]
  * refuses such a model loudly rather than round-tripping it wrong
  * (the in-engine (surface, cont) model has no such ambiguity; only
  * the interchange file does).
  */
object TokenizerExport {

  private def writeLines(spark: SparkSession, path: String,
                         lines: Seq[String]): Unit = {
    // the line format cannot represent \n in content, and a trailing
    // \r would be indistinguishable from a CRLF line ending on
    // re-import ([[readLines]]'s raw-terminator classifier) — refuse
    // LOUDLY rather than export a file that reads back as a subtly
    // different tokenizer (the ##-prefix refusal's discipline)
    lines.find(l => l.contains('\n') || l.contains('\r')).foreach { l =>
      sys.error("tokenizer export: line contains a \\r or \\n control " +
        s"character and cannot round-trip through the line format: " +
        s"'${l.replace("\r", "\\r").replace("\n", "\\n")}' ($path)")
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(p.getParent).foreach(fs.mkdirs(_))
    val out = fs.create(p, true)
    try out.write((lines.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readLines(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      val text = new String(bytes.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8)
      val split = text.split("\n", -1).toSeq
      // drop the final element ONLY when it is the empty string after a
      // trailing newline — published vocab/merges files commonly end
      // WITHOUT one, and unconditionally dropping would silently lose
      // the last piece/merge (a subtly different tokenizer, no error)
      val lines =
        if (split.nonEmpty && split.last.isEmpty) split.dropRight(1)
        else split
      // CRLF is classified from the RAW TERMINATOR BYTES, not from
      // line content: the file is a CRLF file iff it contains "\r\n"
      // and EVERY \n is preceded by \r. The earlier forall-over-lines
      // heuristic was vacuously true for a single-line file (and for a
      // file whose every piece happened to end with \r), silently
      // corrupting content. [[writeLines]] refuses \r inside content,
      // so for this engine's own exports a terminator-adjacent \r can
      // only BE a terminator; an external mixed-ending file is left
      // byte-exact.
      val isCrlf = {
        var i = text.indexOf('\n')
        var all = i >= 0
        while (all && i >= 0) {
          if (i == 0 || text.charAt(i - 1) != '\r') all = false
          else i = text.indexOf('\n', i + 1)
        }
        all
      }
      // strip \r only from lines that were actually \n-TERMINATED: in
      // a CRLF-classified file whose final line has no terminator, a
      // content-trailing \r on that tail is CONTENT, not a terminator
      // — every split element except a terminatorless tail was
      // \n-terminated (the empty-after-trailing-newline element was
      // already dropped above, so then ALL survivors were terminated)
      if (isCrlf) {
        val terminated =
          if (split.nonEmpty && split.last.isEmpty) lines.length
          else lines.length - 1
        lines.zipWithIndex.map { case (l, i) =>
          if (i < terminated && l.endsWith("\r")) l.dropRight(1) else l
        }
      } else lines
    } finally in.close()
  }

  // ---- BPE ----------------------------------------------------------

  val BpeMergesHeader = "#version: graft_bpe_v1"

  /** Write `merges.txt` + `vocab.tsv` under `dir` from a trained merge
    * table ([[Bpe.trainMerges]]'s (rank, left, right, score) rows,
    * already rank-ordered) and the matching [[Bpe.vocabIds]] (sym,
    * tid) rows. */
  def exportBpe(spark: SparkSession, dir: String,
                merges: Seq[(Int, String, String, Long)],
                vocab: Seq[(String, Long)]): Unit = {
    writeLines(spark, s"$dir/merges.txt",
      BpeMergesHeader +: merges.sortBy(_._1).map(m => s"${m._2} ${m._3}"))
    writeLines(spark, s"$dir/vocab.tsv",
      vocab.sortBy(_._2).map { case (s, t) => s"$s\t$t" })
  }

  /** Parse `merges.txt` back to the (left, right) merge list in rank
    * order. */
  def importBpeMerges(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val lines = readLines(spark, s"$dir/merges.txt")
    require(lines.headOption.contains(BpeMergesHeader),
      s"unexpected merges.txt header in $dir: ${lines.headOption.orNull}")
    lines.drop(1).map { l =>
      val sp = l.indexOf(' ')
      require(sp > 0 && sp < l.length - 1, s"malformed merge line: '$l'")
      (l.substring(0, sp), l.substring(sp + 1))
    }
  }

  /** Parse `vocab.tsv` back to (sym, tid) rows. */
  def importBpeVocab(spark: SparkSession, dir: String): Seq[(String, Long)] =
    readLines(spark, s"$dir/vocab.tsv").map { l =>
      val tab = l.lastIndexOf('\t')
      require(tab > 0, s"malformed vocab line: '$l'")
      (l.substring(0, tab), l.substring(tab + 1).toLong)
    }

  // ---- Unigram ------------------------------------------------------

  /** Write `pieces.tsv` from a trained [[Unigram.trainModel]] table:
    * piece, integer micro-log score under the model total, raw count —
    * in the model's UTF-8 piece order. */
  def exportUnigram(spark: SparkSession, dir: String,
                    model: Seq[(String, Long)]): Unit = {
    val total = model.map(_._2).sum
    writeLines(spark, s"$dir/pieces.tsv",
      model.sortWith((a, b) => Bpe.utf8Lt(a._1, b._1)).map { case (p, c) =>
        s"$p\t${Unigram.scoreOf(c, total)}\t$c"
      })
  }

  /** Parse `pieces.tsv` back to the (piece, count) model (scores
    * re-derive from counts — they are redundant in the file, carried
    * for the human/training-job reader). */
  def importUnigram(spark: SparkSession, dir: String): Seq[(String, Long)] =
    readLines(spark, s"$dir/pieces.tsv").map { l =>
      val parts = l.split("\t", -1)
      require(parts.length == 3, s"malformed pieces line: '$l'")
      (parts(0), parts(2).toLong)
    }

  // ---- WordPiece ----------------------------------------------------

  /** Write `vocab.txt`: display-form pieces (`##` continuation prefix)
    * one per line in tid order. */
  def exportWordPiece(spark: SparkSession, dir: String,
                      model: Seq[WordPiece.Piece]): Unit = {
    val bad = model.filter(p => !p.cont && p.surface.startsWith("##"))
    require(bad.isEmpty,
      s"vocab.txt cannot represent initial pieces starting with '##': " +
        bad.map(_.surface).mkString(", "))
    writeLines(spark, s"$dir/vocab.txt",
      WordPiece.tidOrdered(model).map(p =>
        if (p.cont) "##" + p.surface else p.surface))
  }

  /** Parse `vocab.txt` back to pieces (line order = tid order). */
  def importWordPiece(spark: SparkSession,
                      dir: String): Seq[WordPiece.Piece] =
    readLines(spark, s"$dir/vocab.txt").map { l =>
      if (l.startsWith("##")) WordPiece.Piece(l.substring(2), cont = true)
      else WordPiece.Piece(l, cont = false)
    }
}
