package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Global windows over frames that are BOUNDED BY CONSTRUCTION — the
  * rank over ≤k survivors of an `orderBy().limit(k)`, a |strata|-row
  * carry fold, a ≤numShufflePartitions slice-offset table, a |steps|-row
  * funnel report. A partition-less window funnels everything through one
  * task: exactly wrong over unbounded data (loadGini's two-phase rank is
  * the pattern there) and exactly fine over a frame the caller has
  * already capped at metadata scale. The constant partition key states
  * that intent at the API — for the reader — not for the engine: Catalyst's
  * EliminateWindowPartitions folds the constant back out, so execution
  * is the same single-partition window it always was and WindowExec
  * still logs its warning (Bench demotes that one logger, with the
  * audit trail as justification).
  */
object Bounded {
  /** Window spec ordered by `ord` whose frame the CALLER guarantees is
    * small — top-k survivors, strata, slices — never raw-data-scale rows.
    */
  def window(ord: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(ord: _*)
}
