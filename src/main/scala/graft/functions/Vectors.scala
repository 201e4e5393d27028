package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float/double>` columns using codegen'd
  * higher-order builtins (`zip_with`/`aggregate`) — no UDFs, so the hot
  * path stays inside whole-stage codegen at 100 TB scale. */
object Vectors {

  /** Dot product of two array columns (any numeric element type). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Euclidean norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + (x * x).cast("double")))

  /** Cosine similarity (safe against zero vectors). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Word n-grams of a space-tokenised string column, as array<string>.
    * Pure builtins: split → sequence → transform(slice). */
  def wordNgrams(text: Column, n: Int): Column = {
    val words = split(text, " ")
    transform(
      sequence(lit(1), greatest(size(words) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(words, i, lit(n))))
  }

  /** Distinct character n-grams (shingles) of a string column. */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))
}
