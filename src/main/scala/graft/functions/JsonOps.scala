package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** MySQL JSON containment (JSON_CONTAINS — cast_json_func.test;
  * reference routes JSON Items through the server's Item_func_json_*
  * tree, sql/item_json_func.cc). Rules, per the MySQL manual:
  *   - candidate scalar ⊆ target scalar ⟺ they compare equal;
  *   - candidate ⊆ target array ⟺ candidate is contained in SOME
  *     element (or, when candidate is itself an array, EVERY candidate
  *     element is contained in the target array);
  *   - candidate object ⊆ target object ⟺ every candidate key exists
  *     in the target with a contained value.
  * Jackson rides Spark's own classpath; invalid JSON text raises (the
  * server's error 3141 analog). */
object JsonOps {
  private val mapper = new ObjectMapper()

  private def parse(s: String, arg: String): JsonNode =
    try mapper.readTree(s)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"Invalid JSON text in argument $arg to json_contains " +
          s"(MySQL error 3141): ${e.getMessage}")
    }

  private def scalarEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.decimalValue.compareTo(b.decimalValue) == 0
    else a == b

  private def containsNode(target: JsonNode, cand: JsonNode): Boolean =
    if (target.isArray) {
      if (cand.isArray) {
        val it = cand.elements()
        var all = true
        while (all && it.hasNext) {
          val c = it.next()
          all = containsNode(target, c)
        }
        all
      } else {
        val it = target.elements()
        var any = false
        while (!any && it.hasNext) any = containsNode(it.next(), cand)
        any
      }
    } else if (target.isObject) {
      if (!cand.isObject) false
      else {
        val it = cand.fields()
        var all = true
        while (all && it.hasNext) {
          val e = it.next()
          val tv = target.get(e.getKey)
          all = tv != null && containsNode(tv, e.getValue)
        }
        all
      }
    } else !cand.isArray && !cand.isObject && scalarEq(target, cand)

  /** `$`-rooted subset of the MySQL path grammar: `$.key`, `$[i]`,
    * chained. Enough for the MTR tier; richer paths (`*`, `**`) raise. */
  private def atPath(node: JsonNode, path: String): Option[JsonNode] = {
    val p = path.trim
    if (!p.startsWith("$")) throw new IllegalArgumentException(
      s"Invalid JSON path '$path' (MySQL error 3143)")
    val StepRe = """\.(\w+|"[^"]*")|\[(\d+)\]""".r
    var cur: JsonNode = node
    var consumed = 1
    for (m <- StepRe.findAllMatchIn(p.drop(1))) {
      consumed += m.end - m.start
      if (cur != null) {
        cur =
          if (m.group(2) != null) {
            if (cur.isArray) cur.get(m.group(2).toInt) else null
          } else {
            val k = m.group(1).stripPrefix("\"").stripSuffix("\"")
            if (cur.isObject) cur.get(k) else null
          }
      }
    }
    if (consumed != p.length) throw new IllegalArgumentException(
      s"Unsupported JSON path '$path' (only $$.key / $$[i] chains)")
    Option(cur)
  }

  def contains(target: String, cand: String): java.lang.Boolean =
    if (target == null || cand == null) null
    else java.lang.Boolean.valueOf(
      containsNode(parse(target, "1"), parse(cand, "2")))

  def containsAt(target: String, cand: String,
                 path: String): java.lang.Boolean =
    if (target == null || cand == null || path == null) null
    else atPath(parse(target, "1"), path) match {
      case None => null
      case Some(n) =>
        java.lang.Boolean.valueOf(containsNode(n, parse(cand, "2")))
    }
}
