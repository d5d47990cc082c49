package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key carries a large
  * fraction of the fact rows, a plain hash join sends them all to one
  * task. Salting splits each hot key across `salts` partitions by hashing
  * a discriminator column on the fact side and replicating the dimension
  * side `salts` times.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; explicit
  * salting remains the tool for aggregate-then-join pipelines and
  * stream-static joins where AQE cannot re-plan. Result is EXACTLY the
  * plain inner join (the salt is an equality-preserving refinement).
  */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `key`, salted `salts` ways using the
    * fact-side `discriminator` column (any column; unique-ish values give
    * the evenest spread). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 discriminator: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(discriminator), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
