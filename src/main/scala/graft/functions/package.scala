package graft

package object functions {
  /** Public face of the custom Catalyst array-math expressions
    * (implementation in org.apache.spark.sql.graftx — see there for
    * why). */
  val ArrayMath: org.apache.spark.sql.graftx.GraftArrayMath.type =
    org.apache.spark.sql.graftx.GraftArrayMath

  val TopK: org.apache.spark.sql.graftx.GraftTopK.type =
    org.apache.spark.sql.graftx.GraftTopK
}
