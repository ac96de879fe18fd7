package graft.queries

import org.apache.spark.sql.SparkSession

/** Temp tree for queries that materialize files (q95 shards, q112 dedup
  * indexes, q114 IVF index): keyed by user + the Spark applicationId +
  * the sanitized data dir. The applicationId isolates concurrent
  * processes — two gate JVMs over the same data dir would otherwise
  * overwrite each other's part files mid-read — while Overwrite mode
  * keeps re-runs WITHIN a session from accumulating trees; the
  * sanitized full path (not a hashCode) keeps distinct SF dirs apart.
  * Because the applicationId makes every JVM's tree unique, each tree
  * is deleted by a shutdown hook — without it, repeated runs would
  * accumulate shard/index copies in tmpdir until the disk fills. The
  * hook can't run on SIGKILL/OOM, so on first creation we also
  * best-effort sweep stale sibling trees (same `graft_<tag>_<user>_`
  * prefix, different applicationId, untouched for >6h — far beyond any
  * live gate run) left by killed JVMs; age-gating keeps concurrent
  * live JVMs safe.
  */
private[queries] object QueryTmp {

  def dir(tag: String, s: SparkSession, d: String): String = {
    val user = sys.props.getOrElse("user.name", "u")
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${tag}_" + user + "_" + s.sparkContext.applicationId + "_" +
        d.replaceAll("[^a-zA-Z0-9.-]", "_"))
    val path = f.getAbsolutePath
    if (cleanupRegistered.add(path)) {
      // the tree AND its known sibling sidecars (ShardWriter's boundary
      // pin lives beside its layout, not inside it) — deleting only the
      // tree would orphan the pin until the 6h sweep below catches it.
      // Matched by EXACT sidecar name, not an open-ended `<dir>.` prefix:
      // the prefix form would also delete any unrelated sibling file
      // that happens to share the name-plus-dot in the shared tmp parent
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        deleteTree(f)
        new java.io.File(f.getParentFile,
          f.getName + "." + graft.io.ShardWriter.BoundsSidecar)
          .delete(): Unit
      }))
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      val siblings = f.getParentFile.listFiles()
      // Age-gate on the NEWEST mtime anywhere in the tree, not the
      // root's: a directory's own mtime only changes when direct
      // children are added/removed, so a >6h-old JVM still actively
      // writing deep inside its tree would look stale at the root and
      // get its live shards deleted by a newly started JVM.
      if (siblings != null) siblings
        .filter(sib => sib.getName.startsWith(s"graft_${tag}_${user}_") &&
          sib.getAbsolutePath != path && newestMtime(sib) < cutoff)
        .foreach(deleteTree)
    }
    path
  }

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def newestMtime(f: java.io.File): Long = {
    val children = f.listFiles()
    if (children == null) f.lastModified()
    else (f.lastModified() +: children.map(newestMtime)).max
  }

  private def deleteTree(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteTree)
    f.delete(): Unit
  }
}
