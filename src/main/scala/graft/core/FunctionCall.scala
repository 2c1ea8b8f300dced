package graft.core

/** Parsed UDA pipeline call, e.g.
  * `candlecandler('5Min', Open, High, Low, Close, Sum::Volume)`.
  *
  * Mirrors the reference's ParseFunctionCall
  * (sqlparser/registry.go:116-157): quoted literals are init args,
  * bare identifiers are positional column args, and `Name::Col`
  * feeds optional parameter `Name` from column `Col`
  * (utils/functions/datatypes.go:27-56 ArgumentMap).
  */
final case class FunctionCall(
    name: String,
    initArgs: Seq[String],
    positional: Seq[String],
    named: Seq[(String, String)]) {

  /** Build the column mapping for a UDA with the given required
    * parameter names: positional args fill required params in order
    * (a required param may take several columns — the reference lets
    * the *last* required param absorb the remainder, which is how
    * tickcandler's CandlePrice averages several inputs,
    * contrib/candler/candler.go:355-385).
    */
  def argMap(required: Seq[String]): Map[String, Seq[String]] = {
    val base: Map[String, Seq[String]] =
      if (required.isEmpty) Map.empty
      else if (positional.size < required.size)
        throw new IllegalArgumentException(
          s"$name needs ${required.size} column args (${required.mkString(",")}), got ${positional.size}")
      else {
        val head = required.init.zip(positional).map { case (p, c) => p -> Seq(c) }
        val tailCols = positional.drop(required.size - 1)
        (head :+ (required.last -> tailCols)).toMap
      }
    named.foldLeft(base) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, Nil) :+ c)
    }
  }
}

object FunctionCall {
  private val Call = "(?s)^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)\\s*$".r

  def parse(s: String): FunctionCall = s match {
    case Call(name, argStr) =>
      val args = splitTop(argStr).map(_.trim).filter(_.nonEmpty)
      val (init, cols) = args.partition(a => a.startsWith("'") && a.endsWith("'"))
      val (named, positional) = cols.partition(_.contains("::"))
      FunctionCall(
        name.toLowerCase,
        init.map(a => a.substring(1, a.length - 1)),
        positional,
        named.map { a =>
          val Array(k, v) = a.split("::", 2)
          (k.trim, v.trim)
        })
    case _ => throw new IllegalArgumentException(s"cannot parse function call: '$s'")
  }

  /** Split on top-level commas (quotes respected; no nesting in the
    * reference grammar).
    */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ',' if !inQuote => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }
}
