package graft.ext

import org.apache.spark.sql.SparkSession

/** Shared build-once skeleton for persisted serving artifacts (IVF
  * index, BM25 inverted file, trigram postings, Dolma attributes):
  * `_SUCCESS` idempotence guard on the artifact's marker relation,
  * then same-corpus stale-sibling GC, then the build. The
  * content-signature dir-naming convention means a regenerated corpus
  * keys to a NEW dir and its predecessors are unreachable forever —
  * the GC deletes siblings sharing the family+path-hash prefix so the
  * artifact root doesn't grow unboundedly.
  *
  * SINGLE-WRITER assumption (every family inherits it): there is no
  * lock between the `_SUCCESS` probe, the GC, and the build — two
  * drivers building concurrently can overwrite each other's partial
  * output, and the GC can delete a stale-signature sibling out from
  * under a reader still probing it. Correct for a deployment where
  * builds are serialized (this harness's single driver, or an
  * external scheduler); a multi-writer serving tier should stage to a
  * temp dir + atomic rename and age-gate the GC instead.
  */
private[ext] object ArtifactDir {

  /** No-op when `dir/marker/_SUCCESS` exists; otherwise GC siblings
    * whose name shares the prefix captured by `prefixRe` (a dir name
    * NOT matching the family pattern is caller-chosen: nothing safe
    * to GC), then run `build`. */
  def ensure(spark: SparkSession, dir: String, marker: String,
             prefixRe: scala.util.matching.Regex)(build: => Unit): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$marker/_SUCCESS"))) return
    dirPath.getName match {
      case prefixRe(prefix) =>
        val parent = dirPath.getParent
        if (parent != null && fs.exists(parent))
          fs.listStatus(parent)
            .filter(s => s.getPath.getName.startsWith(prefix) &&
              s.getPath.getName != dirPath.getName)
            .foreach(s => fs.delete(s.getPath, true))
      case _ => () // caller-chosen dir name: nothing safe to GC
    }
    build
  }
}
