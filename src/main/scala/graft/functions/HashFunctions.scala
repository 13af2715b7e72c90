package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable hashing primitives.
  *
  * md5 is the one hash that is identical in Spark, DuckDB, and every
  * other engine, so all dedup/minhash/simhash signatures derive from
  * it: take a hex slice of md5("<seed>#<value>") and reinterpret as an
  * integer. Spark side uses conv(hex,16,10); the DuckDB oracle uses
  * ('0x'||hex)::BIGINT. Both are pure codegen'd expressions.
  */
object HashFunctions {

  import org.apache.spark.sql.graft.HashExpressions

  /** 32-bit (always-positive) seeded hash of a string column.
    * Bit-identical to `conv(substring(md5(x),1,8),16,10)` — the first
    * 8 hex chars ARE the digest's top 32 bits — without the hex
    * encode/substring/parse string round trip per value
    * ([[org.apache.spark.sql.graft.HashExpressions]], r19). */
  def hash32(seed: Int, c: Column): Column =
    shiftrightunsigned(
      HashExpressions.md5Prefix64(concat(lit(seed.toString), lit("#"), c)), 32)

  /** 60-bit seeded hash (15 hex chars — stays inside signed int64 for
    * both engines). Used for simhash bit sampling. */
  def hash60(seed: Int, c: Column): Column =
    shiftrightunsigned(
      HashExpressions.md5Prefix64(concat(lit(seed.toString), lit("#"), c)), 4)

  /** Character shingles of width `w` over a string column: substrings at
    * every offset 1..max(len-w+1, 1). Pure Catalyst (sequence+transform),
    * explode-ready. Texts shorter than `w` yield the whole text. */
  def shingles(c: Column, w: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c) - lit(w - 1), lit(1))),
      i => c.substr(i, lit(w)))

  /** Rolling-hash style document fingerprint: the minimum 32-bit shingle
    * hash — one stable 'content sketch' value per document. */
  def minShingleHash(c: Column, w: Int, seed: Int = 0): Column =
    array_min(transform(shingles(c, w), s => hash32(seed, s)))
}
