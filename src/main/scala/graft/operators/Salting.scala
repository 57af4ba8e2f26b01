package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100-TB problem AQE's skew-join
  * handles reactively; salting handles it structurally when a key is known
  * to be pathological — e.g. a null-bucket or a celebrity user).
  *
  * `saltedJoin` splits every fact-side key across `salts` reducers by
  * deriving a DETERMINISTIC salt from a distinguishing fact column
  * (xxhash64 mod salts — reproducible, unlike rand()), and explodes the
  * dim side into `salts` copies so every (key, salt) pair still finds its
  * dim row. Result-equivalent to the plain equi-join; shuffle width on the
  * hot key grows by `salts`×.
  */
object Salting {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltSource: Column,
      salts: Int = 8,
      joinType: String = "inner"): DataFrame = {
    val f = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"), joinType)
      .drop("__salt")
  }
}
