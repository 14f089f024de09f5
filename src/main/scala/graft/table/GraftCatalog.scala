package graft.table

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Durable catalog (the ebenezer Hive-metastore analogue, SURVEY.md R7):
  * `GraftTable.registerViews` makes a table queryable by name but its views
  * die with the SparkSession. This catalog persists (name → tableDir)
  * registrations as a JSON file on the table filesystem, so a NEW session —
  * on any machine that can reach the storage — restores the same names
  * with one call. No Hive metastore exists in this sandbox (and none is
  * required at 1000 executors either: the catalog is a metadata file like
  * the snapshots themselves, read once per session).
  *
  * Concurrency: last-writer-wins on the catalog file, same single-writer
  * discipline as snapshot commits.
  */
object GraftCatalog {

  final case class Entry(name: String, tableDir: String)

  private def file(catalogDir: String) = s"$catalogDir/graft-catalog.json"

  def entries(spark: SparkSession, catalogDir: String): Seq[Entry] =
    GraftTable.readStringOpt(spark, file(catalogDir)) match {
      case None => Nil
      case Some(text) =>
        implicit val fmts: Formats = DefaultFormats
        val j = JsonMethods.parse(text)
        (j \ "tables").extract[Seq[Map[String, String]]]
          .map(m => Entry(m("name"), m("dir")))
    }

  /** Upsert a (name → tableDir) registration and register its views in the
    * current session.
    */
  def register(
      spark: SparkSession, catalogDir: String, name: String, tableDir: String): Unit = {
    val kept = entries(spark, catalogDir).filterNot(_.name == name)
    val all = kept :+ Entry(name, tableDir)
    write(spark, catalogDir, all.sortBy(_.name))
    GraftTable.registerViews(spark, tableDir, name)
  }

  def drop(spark: SparkSession, catalogDir: String, name: String): Unit =
    write(spark, catalogDir, entries(spark, catalogDir).filterNot(_.name == name))

  /** Re-register every cataloged table's views in (a possibly brand-new)
    * session. Returns the restored names.
    */
  def restore(spark: SparkSession, catalogDir: String): Seq[String] = {
    val all = entries(spark, catalogDir)
    all.foreach(e => GraftTable.registerViews(spark, e.tableDir, e.name))
    all.map(_.name)
  }

  private def write(spark: SparkSession, catalogDir: String, all: Seq[Entry]): Unit = {
    def js(v: String) = "\"" + v.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val body = all.map(e => s"""{"name": ${js(e.name)}, "dir": ${js(e.tableDir)}}""")
      .mkString("[", ", ", "]")
    // atomic (tmp-then-rename): a concurrent reader never sees a truncated
    // catalog mid-upsert (ADVICE r2)
    GraftTable.writeStringAtomic(spark, file(catalogDir),
      s"""{"format": "graft-catalog/1", "tables": $body}""")
  }
}
