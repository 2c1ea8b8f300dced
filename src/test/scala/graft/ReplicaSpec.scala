package graft

import graft.catalog.{BucketCatalog, ReplicaSync}
import graft.core.TimeBucketKey
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Commit-log replication: a replica catalog converges to the primary
  * by applying only the partitions each commit names — the reference's
  * WAL-streaming replication semantics (replication/sender.go:14-48,
  * receiver.go:12-40) on the pull model.
  */
class ReplicaSpec extends SparkSpec {
  import spark.implicits._

  private val ohlcv = StructType(Seq(
    StructField("Epoch", LongType), StructField("Open", DoubleType)))

  test("replica converges through writes, upserts and deletes; sync is incremental") {
    val primaryRoot = Files.createTempDirectory("graft-primary").toString
    val replicaRoot = Files.createTempDirectory("graft-replica").toString
    val primary = new BucketCatalog(spark, primaryRoot)
    val tbk = TimeBucketKey.parse("AAPL/1Min/OHLCV")
    primary.create(tbk, ohlcv, isVariable = false)

    // bootstrap write (append branch) + an upsert (stage-swap branch)
    primary.write(tbk, Seq((60L, 1.0), (120L, 2.0)).toDF("Epoch", "Open"))
    primary.write(tbk, Seq((120L, 2.5), (180L, 3.0)).toDF("Epoch", "Open"))

    val syncer = new ReplicaSync(spark, primaryRoot, replicaRoot)
    assert(syncer.sync() > 0)
    val replica = new BucketCatalog(spark, replicaRoot)
    def rows(c: BucketCatalog) =
      c.read(tbk).orderBy("Epoch").collect().map(r =>
        (r.getAs[Long]("Epoch"), r.getAs[Double]("Open"))).toSeq
    assert(rows(replica) == Seq((60L, 1.0), (120L, 2.5), (180L, 3.0)))
    assert(rows(replica) == rows(primary))

    // nothing new → no commits applied
    assert(syncer.sync() == 0)

    // a range delete propagates (including cleared partitions)
    primary.deleteRange(tbk, 100L, endEpoch = 150L)
    assert(syncer.sync() > 0)
    assert(rows(replica) == Seq((60L, 1.0), (180L, 3.0)))
    assert(rows(replica) == rows(primary))

    // replica is a full catalog: info + symbols line up
    assert(replica.listSymbols("OHLCV") == Seq("AAPL"))
    assert(replica.getInfo("OHLCV")._1.fieldNames.toSeq == Seq("Epoch", "Open"))

    // destroy propagates (it logs a cleared commit) — replicas must
    // not keep serving destroyed buckets
    primary.write(TimeBucketKey.parse("MSFT/1Min/OHLCV"),
      Seq((60L, 9.0)).toDF("Epoch", "Open"))
    assert(syncer.sync() > 0)
    assert(replica.listSymbols("OHLCV").sorted == Seq("AAPL", "MSFT"))
    primary.destroy(TimeBucketKey.parse("MSFT/1Min/OHLCV"))
    assert(syncer.sync() > 0)
    assert(replica.listSymbols("OHLCV") == Seq("AAPL"))
  }
}
