package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Iceberg-style SCAN PLANNING over snapshot tables: prune whole data
  * FILES by parquet footer min/max column statistics BEFORE any Spark
  * scan is built (the manifest-stats pruning `/root/reference`'s
  * Iceberg 1.8 runtime performs at plan time, re-expressed over this
  * layout's plain-parquet snapshots; reference
  * `docker-compose.yml:125`, jobs read via Iceberg scans throughout).
  *
  * Why file-level (Spark already skips row groups): at 100 TB a table
  * is millions of files, and a scan's fixed cost is per-FILE — listing,
  * footer reads, task scheduling — before a single row group is
  * considered. Row-group pruning happens per task AFTER those costs;
  * file pruning removes the tasks themselves. On a sort-clustered
  * table ([[Snapshot.rewriteSorted]] — each file a disjoint key range)
  * a point/range query plans O(matching files) tasks instead of
  * O(all files).
  *
  * Contract: pruning is a SUPERSET guarantee — a kept set always
  * contains every row matching the ranges; the exact range filter is
  * applied on top ([[Snapshot.prunedRead]]), so the result equals the
  * unpruned filter bit-for-bit. A file with no statistics for a ranged
  * column (or a column absent from its schema) is never pruned.
  * Partition-directory columns never appear in footers, so ranges on
  * them keep every file — partition pruning is the scan's own
  * PartitionFilters job (S12), which composes with this one.
  */
object ScanPruning {

  /** Inclusive range predicate on one column; None = unbounded on that
    * side. Bounds must be Int/Long (integral columns, incl. timestamp
    * micros), Float/Double (floating), or String (UTF8 binary). */
  final case class ColumnRange(column: String,
                               lower: Option[Any],
                               upper: Option[Any])

  /** The scan plan for one snapshot component dir: which data files
    * survive the stats check, out of how many. */
  final case class DirPlan(kept: Seq[String], total: Int)

  /** Parquet data files directly under `dir` (recursive through
    * partition subdirs), EXCLUDING merge-on-read sidecars (`_mor` is a
    * separate component with its own plan) and non-data files. Listed
    * through the Hadoop FS API with the session's conf — the same
    * resolution the footers are opened with. */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    // a root that is ITSELF a sidecar dir (an appends component being
    // planned) contains _mor in its own path — the exclusion only
    // guards a BASE dir against recursing into its sidecars (the same
    // rootInMor rule as the metadata tables' footer walk)
    val rootInMor = dir.contains("/_mor/")
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      val inMor = !rootInMor && f.getPath.toString.contains("/_mor/")
      if (f.isFile && name.endsWith(".parquet") && !inMor &&
        !name.startsWith("_") && !name.startsWith("."))
        out += f.getPath.toString
    }
    out.result().sorted
  }

  /** Does `file` possibly contain rows matching EVERY range? One footer
    * open (row-group metadata only — no data pages, the same read unit
    * as the `.snapshots` record counts); a file overlaps a range iff
    * SOME row group possibly matches it: the group's [min, max] is not
    * disjoint from [lower, upper], and — for a POINT range (lower ==
    * upper) — the group's parquet BLOOM FILTER, when one was written
    * ([[bloomWriteOptions]]), does not definitively exclude the value.
    * Bloom pruning is what min/max cannot do on an UNSORTED
    * high-cardinality column (every file's range spans the whole
    * domain; a point lookup still prunes to ~1 file — the
    * Iceberg/Delta bloom-index capability). Conservative whenever
    * statistics/filters are missing: absent column, absent stats and
    * absent bloom → the file is kept. */
  def fileOverlaps(spark: SparkSession, file: String,
                   ranges: Seq[ColumnRange]): Boolean = {
    if (ranges.isEmpty) return true
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      ranges.forall { r =>
        val point = for {
          l <- r.lower; u <- r.upper if cmp(l, u) == 0
        } yield l
        blocks.exists { b =>
          val found = b.getColumns.asScala
            .find(_.getPath.toDotString.equalsIgnoreCase(r.column))
            .orNull
          if (found == null) true // column absent → cannot exclude
          else {
            val st = found.getStatistics
            val statsExclude = st != null && st.hasNonNullValue && {
              val bMin = stat(st.genericGetMin.asInstanceOf[AnyRef])
              val bMax = stat(st.genericGetMax.asInstanceOf[AnyRef])
              r.lower.exists(l => cmp(bMax, l) < 0) ||
                r.upper.exists(u => cmp(bMin, u) > 0)
            }
            if (statsExclude) false
            else point match {
              case Some(v) =>
                val bf = reader.getBloomFilterDataReader(b)
                  .readBloomFilter(found)
                bf == null || bloomMightContain(bf, found, v)
              case None => true
            }
          }
        }
      }
    } finally reader.close()
  }

  /** Writer options enabling a parquet bloom filter on `column` —
    * pass to [[Snapshot.createOrReplace]]'s `options`. Size `ndv` to
    * the expected distinct count per FILE (an over-estimate only
    * costs footer bytes; an under-estimate costs false positives →
    * unpruned files, never wrong results). */
  def bloomWriteOptions(column: String, ndv: Long): Map[String, String] =
    Map(s"parquet.bloom.filter.enabled#$column" -> "true",
      s"parquet.bloom.filter.expected.ndv#$column" -> ndv.toString)

  /** Bloom membership probe with the value converted to the column's
    * PHYSICAL type (the hash domain). Unhashable physical types report
    * "might contain" — conservative, never wrong. */
  private def bloomMightContain(
      bf: org.apache.parquet.column.values.bloomfilter.BloomFilter,
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
      v: Any): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val h = cc.getPrimitiveType.getPrimitiveTypeName match {
      case INT64 => bf.hash(v.asInstanceOf[Number].longValue)
      case INT32 => bf.hash(v.asInstanceOf[Number].intValue)
      case DOUBLE => bf.hash(v.asInstanceOf[Number].doubleValue)
      case FLOAT => bf.hash(v.asInstanceOf[Number].floatValue)
      case BINARY =>
        bf.hash(org.apache.parquet.io.api.Binary.fromString(v.toString))
      case _ => return true
    }
    bf.findHash(h)
  }

  /** Plan one component dir: list its data files, keep those whose
    * footer stats overlap every range. */
  def pruneDir(spark: SparkSession, dir: String,
               ranges: Seq[ColumnRange]): DirPlan = {
    val files = dataFiles(spark, dir)
    DirPlan(files.filter(fileOverlaps(spark, _, ranges)), files.size)
  }

  /** Normalize a footer statistic value to the comparison domain. */
  private def stat(v: AnyRef): Any = v match {
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case x => x
  }

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer |
         _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }

  /** Cross-type ordered comparison: integral pairs compare exactly as
    * longs (a double lane would lose precision past 2^53 — snapshot
    * ids and row keys live there), anything else numeric as doubles,
    * strings as strings. Mixed string/number is a caller error. */
  private[pipeline] def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number)
      if isIntegral(x) && isIntegral(y) =>
      java.lang.Long.compare(x.longValue, y.longValue)
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case (x: String, y: String) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(
      s"unsupported bound comparison: ${a.getClass.getName} vs " +
        s"${b.getClass.getName}")
  }
}
