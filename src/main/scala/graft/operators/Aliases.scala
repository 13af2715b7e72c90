package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileContext, Options, Path, UnsupportedFileSystemException}

/** Milvus alias surface (create_alias / alter_alias / drop_alias):
  * a level of indirection between the name searchers use and the
  * index/collection directory serving it. The production move it
  * exists for is the blue-green swap — build or retrain a NEW index
  * dir offline, then `alterAlias` repoints the name in one atomic
  * rename, so every search issued after the swap reads the new index
  * and none ever reads a half-built one.
  *
  * Layout: one file per alias under the registry dir, containing the
  * target path (UTF-8). Writes go to a `_tmp` sibling and rename into
  * place — rename is atomic on HDFS and local filesystems, so readers
  * see either the old target or the new, never a torn path.
  */
object Aliases {

  private val NamePattern = "[A-Za-z0-9][A-Za-z0-9_.-]*".r

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def aliasPath(registry: String, alias: String): Path = {
    require(NamePattern.matches(alias),
      s"alias '$alias' must match ${NamePattern.regex}")
    new Path(registry, alias)
  }

  private def write(spark: SparkSession, registry: String, alias: String,
      target: String): Unit = {
    val fs = fsOf(spark, registry)
    val p = aliasPath(registry, alias)
    val tmp = new Path(registry, s"${alias}_tmp")
    val out = fs.create(tmp, true)
    try out.write(target.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // Overwrite-atomic commit: FileContext.rename(OVERWRITE) replaces
    // the old pointer in one operation, so a concurrent resolveAlias
    // observes the old target or the new one — never a missing alias.
    // Filesystems without a FileContext binding fall back to
    // delete-then-rename; resolveAlias covers that gap by falling back
    // to the staged tmp (which already holds the full new value).
    try {
      val fc = FileContext.getFileContext(fs.getUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedFileSystemException =>
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p), s"alias commit rename $tmp -> $p failed")
    }
  }

  /** Register a new alias. Fails if the name is taken (Milvus
    * create_alias semantics) — repointing is [[alterAlias]]'s job so a
    * typo can't silently hijack live traffic. */
  def createAlias(spark: SparkSession, registry: String, alias: String,
      target: String): Unit = {
    val fs = fsOf(spark, registry)
    require(!fs.exists(aliasPath(registry, alias)),
      s"alias '$alias' already exists — use alterAlias to repoint it")
    write(spark, registry, alias, target)
  }

  /** Atomically repoint an existing alias — the blue-green swap. */
  def alterAlias(spark: SparkSession, registry: String, alias: String,
      target: String): Unit = {
    val fs = fsOf(spark, registry)
    require(fs.exists(aliasPath(registry, alias)),
      s"alias '$alias' does not exist — use createAlias first")
    write(spark, registry, alias, target)
  }

  def dropAlias(spark: SparkSession, registry: String,
      alias: String): Unit = {
    val fs = fsOf(spark, registry)
    val p = aliasPath(registry, alias)
    require(fs.exists(p), s"alias '$alias' does not exist")
    require(fs.delete(p, false), s"failed to delete alias $p")
  }

  /** The directory an alias currently points at. If the pointer file is
    * momentarily absent because a delete-then-rename fallback swap is in
    * flight, the staged `_tmp` sibling (which holds the complete new
    * target) answers instead — a reader never sees a registered alias
    * vanish mid-swap. */
  def resolveAlias(spark: SparkSession, registry: String,
      alias: String): String = {
    val fs = fsOf(spark, registry)
    val p = aliasPath(registry, alias)
    def read(path: Path): String = {
      val in = fs.open(path)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    if (fs.exists(p)) read(p)
    else {
      val tmp = new Path(registry, s"${alias}_tmp")
      require(fs.exists(tmp), s"alias '$alias' does not exist in $registry")
      read(tmp)
    }
  }

  /** Every (alias, target) pair in the registry. */
  def listAliases(spark: SparkSession, registry: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, registry)
    val root = new Path(registry)
    val rows =
      if (!fs.exists(root)) Seq.empty[(String, String)]
      else fs.listStatus(root).toSeq
        .filter(f => f.isFile && !f.getPath.getName.endsWith("_tmp"))
        .map(f => (f.getPath.getName,
          resolveAlias(spark, registry, f.getPath.getName)))
    rows.toDF("alias", "target")
  }
}
