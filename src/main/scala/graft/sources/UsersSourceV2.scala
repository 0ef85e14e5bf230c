package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XXH64}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a first-class DataSource V2 table — the acquisition seam
  * (`dags/producer/kafka_streaming_service.py:113-130`) exposed through
  * Spark's connector API instead of a driver-built DataFrame:
  *
  * {{{
  *   spark.read.format("graft.sources.UsersSourceV2")
  *     .option("n", 10000).option("numPartitions", 32).load()
  * }}}
  *
  * Emits exactly the rows of [[UserGen.users]] (same seeded xxhash64
  * derivations, same ~1/97 dirty-coordinate rule — the parity is a spec
  * assertion), but through the planner-visible source surface, which buys
  * what a DataFrame helper can't:
  *
  *  - **partition planning**: the id range splits into `numPartitions`
  *    [[InputPartition]]s — on a 1000-executor cluster each task
  *    materializes its own slice, no driver loop, no single-partition
  *    bottleneck;
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): a query
  *    reading `email` generates ONLY `email` — including nested pruning
  *    (`name.first` builds a 1-field struct), so the scan does no work
  *    the plan discards;
  *  - **limit pushdown** ([[SupportsPushDownLimit]]): `LIMIT k` caps the
  *    generated id range at the source, not after materialization.
  *
  * Options: `n` (rows, default 1000), `seed` (default 42),
  * `numPartitions` (default `spark.sql.shuffle.partitions`-independent 4).
  */
class UsersSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UsersSourceV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new UsersSourceV2.UsersTable(
      n = opts.getOrElse("n", "1000").toLong,
      seed = opts.getOrElse("seed", "42").toLong,
      parts = opts.getOrElse("numpartitions",
        opts.getOrElse("numPartitions", "4")).toInt)
  }
}

object UsersSourceV2 {

  /** The nested randomuser-shaped contract of [[UserGen.users]]. */
  val schema: StructType = StructType(Seq(
    StructField("name", StructType(Seq(
      StructField("title", StringType),
      StructField("first", StringType),
      StructField("last", StringType)))),
    StructField("gender", StringType),
    StructField("location", StructType(Seq(
      StructField("street", StructType(Seq(
        StructField("number", LongType),
        StructField("name", StringType)))),
      StructField("city", StringType),
      StructField("country", StringType),
      StructField("postcode", StringType),
      StructField("coordinates", StructType(Seq(
        StructField("latitude", StringType),
        StructField("longitude", StringType))))))),
    StructField("email", StringType)))

  private class UsersTable(n: Long, seed: Long, parts: Int)
      extends Table with SupportsRead {
    override def name(): String = s"graft_users(n=$n)"
    override def schema(): StructType = UsersSourceV2.schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new UsersScanBuilder(n, seed, parts)
  }

  private class UsersScanBuilder(var n: Long, seed: Long, parts: Int)
      extends ScanBuilder
      with SupportsPushDownRequiredColumns with SupportsPushDownLimit
      with SupportsPushDownAggregates {
    private var required: StructType = UsersSourceV2.schema
    private var countPushed = false
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def pushLimit(limit: Int): Boolean = {
      n = math.min(n, limit.toLong); true
    }
    // COUNT(*) with no grouping is answerable from the source's
    // metadata alone (the row count IS the `n` option, post-limit) —
    // the scan then emits ONE pre-aggregated row and generates nothing.
    override def supportCompletePushDown(agg: Aggregation): Boolean =
      agg.groupByExpressions.isEmpty &&
        agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    override def pushAggregation(agg: Aggregation): Boolean = {
      if (!supportCompletePushDown(agg)) false
      else {
        countPushed = true
        required = StructType(
          agg.aggregateExpressions.toSeq.zipWithIndex.map { case (_, i) =>
            StructField(s"count_$i", LongType, nullable = false)
          })
        true
      }
    }
    override def build(): Scan =
      if (countPushed) new CountScan(n, required)
      else new UsersScan(n, seed, parts, required)
  }

  /** The pushed-COUNT(*) scan: one partition, one row, zero generation. */
  private class CountScan(n: Long, required: StructType) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String = s"graft_users pushed-count n=$n"
    override def planInputPartitions(): Array[InputPartition] =
      Array(UsersRange(0, 1))
    override def createReaderFactory(): PartitionReaderFactory =
      CountReaderFactory(n, required.length)
  }

  // standalone (not an inner class): the factory ships to executors, and
  // capturing the enclosing Scan would make the closure unserializable
  private case class CountReaderFactory(n: Long, width: Int)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val go = !emitted; emitted = true; go }
        override def get(): InternalRow =
          new GenericInternalRow(Array.fill[Any](width)(n))
        override def close(): Unit = ()
      }
  }

  private case class UsersRange(start: Long, end: Long) extends InputPartition

  private class UsersScan(n: Long, seed: Long, parts: Int, required: StructType)
      extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft_users n=$n seed=$seed partitions=$parts " +
        s"cols=[${required.fieldNames.mkString(",")}]"
    override def planInputPartitions(): Array[InputPartition] = {
      val k = math.max(1, math.min(parts.toLong, math.max(n, 1L))).toInt
      (0 until k).map { i =>
        UsersRange(n * i / k, n * (i + 1) / k)
      }.filter(r => r.end > r.start).toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new UsersReaderFactory(seed, required)
  }

  private class UsersReaderFactory(seed: Long, required: StructType)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val r = p.asInstanceOf[UsersRange]
      new UsersReader(r.start, r.end, seed, required)
    }
  }

  private val titles = Array("Mr", "Ms", "Dr", "Mx")
  private val genders = Array("male", "female")
  private val streets = Array("High Street", "Station Road", "Main Street",
    "Park Avenue", "Mill Lane")
  private val cities = Array("Springfield", "Riverton", "Lakeside",
    "Hillview", "Brookfield")
  private val countries = Array("Utopia", "Erewhon", "Atlantis", "Arcadia")

  /** Row generation: the exact per-id derivation of [[UserGen.users]],
    * evaluated natively. The salted hash reproduces Spark's
    * `xxhash64(id, lit(seed: Long), lit(salt: Int))` fold — seed 42,
    * then hashLong(id), hashLong(seed), hashInt(salt) — via the same
    * [[XXH64]] kernel the expression compiles to, so the two surfaces
    * are bit-identical by construction (and asserted in the spec). */
  private class UsersReader(start: Long, end: Long, seed: Long,
      required: StructType) extends PartitionReader[InternalRow] {
    private var id = start - 1

    override def next(): Boolean = { id += 1; id < end }

    // mask, not abs: abs(Long.MinValue) is still negative (the 2^-64 hash
    // edge) and pick()'s modulo would index negatively — a task crash.
    // UserGen masks identically, keeping the two surfaces bit-identical.
    private def h(salt: Int): Long =
      XXH64.hashInt(salt,
        XXH64.hashLong(seed, XXH64.hashLong(id, 42L))) & Long.MaxValue

    private def pick(options: Array[String], hv: Long): String =
      options((hv % options.length).toInt)

    private def utf(s: String): UTF8String = UTF8String.fromString(s)

    private def fmt(pattern: String, v: Any): String =
      String.format(java.util.Locale.US, pattern, v.asInstanceOf[AnyRef])

    // Generation is DRIVEN BY the (possibly nested-pruned) required
    // schema: a `select(email)` computes email alone — none of the other
    // hash derivations or string formatting runs, so column pruning cuts
    // the generation work itself, not just the bytes returned.
    private def field(path: String): Any = path match {
      case "name.title"   => utf(pick(titles, h(1)))
      case "name.first"   => utf(s"First$id")
      case "name.last"    => utf(s"Last${h(2) % 1000}")
      case "gender"       => utf(pick(genders, h(3)))
      case "location.street.number" => h(4) % 9999 + 1
      case "location.street.name"   => utf(pick(streets, h(5)))
      case "location.city"     => utf(pick(cities, h(8)))
      case "location.country"  => utf(pick(countries, h(9)))
      case "location.postcode" => utf(fmt("%05d", Long.box(h(10) % 100000)))
      case "location.coordinates.latitude" =>
        utf(if (id % 97 == 0) "not-a-number"
        else fmt("%.4f", Double.box((h(6) % 180000).toDouble / 1000.0 - 90.0)))
      case "location.coordinates.longitude" =>
        utf(if (id % 89 == 0) ""
        else fmt("%.4f", Double.box((h(7) % 360000).toDouble / 1000.0 - 180.0)))
      case "email" => utf(s"user$id@example.com")
      case other => throw new IllegalArgumentException(s"unknown field $other")
    }

    private def gen(req: StructType, prefix: String): GenericInternalRow =
      new GenericInternalRow(req.fields.map[Any] { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => gen(s, path)
          case _ => field(path)
        }
      })

    override def get(): InternalRow = gen(required, "")

    override def close(): Unit = ()
  }
}
