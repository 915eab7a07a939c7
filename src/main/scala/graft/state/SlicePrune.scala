package graft.state

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Slice-keyed pruning of a corpus-aged table before an id join.
  *
  * The resume primitive (J1) anti-joins every incoming batch against the
  * ENTIRE persisted signature state (`Checkpoints.runEpoch`) — and the
  * state side is the one that grows with corpus age. The bucketed layout
  * already removes the state-side EXCHANGE, but every epoch still sorts
  * and merges all 10^12 persisted ids to answer a question about a
  * 10^8-row slice. Membership of `state.id IN slice.id` is one-sided:
  * a state row whose id is not in the slice can never affect the
  * anti-join result, so a Bloom sketch of the SLICE's ids (the small,
  * bounded side) filters the state scan down to ~|slice| + fp rows
  * before the join ever shuffles or sorts.
  *
  * Exactness is structural, not probabilistic: a false POSITIVE only
  * lets an extra state row through to the exact join, which drops it; a
  * false negative is impossible for a Bloom filter. The joined result is
  * therefore byte-identical at any fpp — the sketch tunes cost only
  * (pinned by SlicePruneSpec with a deliberately undersized sketch).
  *
  * Scale shape: the sketch is built with one aggregation over the
  * slice's KEY COLUMN only (column pruning drops text/html from the
  * build scan) via the public `DataFrameStatFunctions.bloomFilter`
  * distributed aggregate, then TORRENT-BROADCAST once per executor —
  * the task closure carries an 8-byte handle, not the bit array. At the
  * defaults (4M expected keys, 1% fpp) the sketch is ~4.8 MB; size
  * `expectedItems` to the slice's upper bound — an undersized sketch
  * degrades fpp (cost), never correctness.
  *
  * Reference analog: `find_new_images`' chunked point-lookups
  * (persistence/db.rs:132-164) are the same "probe only what the batch
  * asks about" idea; RocksDB got it from its memtable/SST bloom filters,
  * a columnar store has to build the slice-keyed filter explicitly.
  */
object SlicePrune {

  /** Bloom sketch of `df.keyCol` (string or long), torrent-broadcast.
    * One distributed aggregation job over the pruned key column.
    *
    * Lifecycle: the returned handle pins ~bytes-of-sketch in every
    * executor's block manager until `unpersist()` or until the driver GCs
    * the handle and ContextCleaner sweeps it. Epoch loops that build one
    * sketch per epoch (Checkpoints.runEpoch) unpersist explicitly once the
    * epoch's writes commit; callers returning lazy frames (SubDocState)
    * lean on ContextCleaner — drop the frame to release the sketch.
    */
  def keySketch(df: DataFrame, keyCol: String,
                expectedItems: Long, fpp: Double): Broadcast[BloomFilter] = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // a null key never equals anything in an equi-join, so omitting nulls
    // from the sketch keeps the downstream join exact
    val bf = df.filter(col(keyCol).isNotNull).stat.bloomFilter(keyCol, expectedItems, fpp)
    df.sparkSession.sparkContext.broadcast(bf)
  }

  /** `might_contain_key(sketch, key)` as a Column predicate. */
  def mightContain(sketch: Broadcast[BloomFilter], key: Column): Column =
    shim.toColumn(MightContainKey(shim.toExpression(key), sketch))

  /** `large` reduced to rows whose `largeKey` might appear in
    * `keys.keysKey` — a superset of the exact semi-join, so feeding the
    * result into an exact (anti/semi/inner) join on the same key yields
    * byte-identical output while the join's large-side input shrinks
    * from O(|large|) to O(|keys| + fp·|large|).
    */
  def pruneByKeys(large: DataFrame, largeKey: String,
                  keys: DataFrame, keysKey: String,
                  expectedItems: Long, fpp: Double): DataFrame = {
    val sketch = keySketch(keys, keysKey, expectedItems, fpp)
    large.filter(mightContain(sketch, col(largeKey)))
  }
}

/** Membership probe against a broadcast Bloom sketch. Codegen'd; the
  * byte contract matches the builder: `stat.bloomFilter` puts strings as
  * UTF-8 bytes (`putString`), probed here with `UTF8String.getBytes`
  * (already UTF-8), and longs via put/mightContainLong.
  */
case class MightContainKey(child: Expression, sketch: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"might_contain_key expects a string or bigint key, got ${other.catalogString}")
  }

  // resolved once per executor from the torrent-broadcast block, not
  // per task closure
  @transient private lazy val filter: BloomFilter = sketch.value

  def hitString(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)
  def hitLong(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => hitString(input.asInstanceOf[UTF8String])
    case LongType   => hitLong(input.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mightContainExpr", this, classOf[MightContainKey].getName)
    child.dataType match {
      case StringType => nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hitString($c);")
      case LongType   => nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hitLong($c);")
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainKey =
    copy(child = newChild)

  override def prettyName: String = "might_contain_key"

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
}
