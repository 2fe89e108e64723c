package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioned + sorted parquet layout writer (the sibling of
  * [[Bucketing]]'s hash co-location): hive-style partition directories on a
  * coarse column (date, source) plus per-file sort on a fine column
  * (timestamp, key).
  *
  * Why this matters at 100 TB: the partition dirs give PLANNING-time
  * pruning (PartitionPruningSpec), and the in-file sort gives SCAN-time
  * row-group skipping — parquet stores min/max per row group, so a range
  * predicate on the sort column reads only the matching stripe of each
  * file instead of decoding it whole. Spark's parquet reader applies those
  * stats automatically; the layout is what makes them selective (an
  * unsorted file has every row group spanning the full value range — the
  * stats prune nothing).
  *
  * One shuffle total: `repartition(partCol)` co-locates each partition
  * value, then `sortWithinPartitions` orders rows inside each task so each
  * written file is one sorted run. No global sort — a `orderBy` would add
  * a range-exchange over the entire dataset for no additional skipping
  * power.
  */
object Layout {

  def writePartitionedSorted(df: DataFrame, dir: String,
                             partCol: String, sortCols: Seq[String]): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions((partCol +: sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partCol).parquet(dir)
}
