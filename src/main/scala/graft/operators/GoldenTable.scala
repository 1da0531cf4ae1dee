package graft.operators

import org.apache.spark.sql.DataFrame

/** Arrow-style ASCII table renderer (SURVEY §7.4 risk 2): the reference's
  * tests assert on `assert_batches_eq!` pretty-printed tables, whose
  * format differs from Spark's `show()` (nulls render as empty cells,
  * list nulls as `[3, , 4]`, `+----+` borders per column). Rendering our
  * frames the same way lets goldens be carried over verbatim.
  *
  * Driver-side by construction (it formats a collected result) — render
  * small/aggregated frames only.
  */
object GoldenTable {

  private def fmt(v: Any): String = v match {
    case null => ""
    // collection.Seq, not the (immutable) Seq default: Spark rows carry
    // mutable.ArraySeq for array columns
    case s: scala.collection.Seq[_] => s.map(fmt).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${fmt(k)}: ${fmt(x)}" }.mkString("{", ", ", "}")
    // arrow prints structs with field names: {a: foo, b: 42}
    case r: org.apache.spark.sql.Row if r.schema != null =>
      r.schema.fieldNames.zip(r.toSeq)
        .map { case (n, x) => s"$n: ${fmt(x)}" }.mkString("{", ", ", "}")
    case r: org.apache.spark.sql.Row => r.toSeq.map(fmt).mkString("{", ", ", "}")
    case a: Array[Byte] => a.map("%02x".format(_)).mkString
    case other => other.toString
  }

  /** Render like arrow's pretty print: `+--+--+` border, header, rows. */
  def render(df: DataFrame, maxRows: Int = 100): String = {
    val header = df.columns.toSeq
    val rows = df.take(maxRows).toSeq.map(_.toSeq.map(fmt))
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def line(vals: Seq[String]) = vals.zip(widths)
      .map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    (Seq(sep, line(header), sep) ++ rows.map(line) :+ sep).mkString("\n")
  }

  /** Assert-style compare against an expected golden block (leading/
    * trailing whitespace per line ignored, like assert_batches_eq). */
  def matches(df: DataFrame, expected: String): Boolean = {
    def normalize(s: String) =
      s.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    normalize(render(df)) == normalize(expected)
  }
}
