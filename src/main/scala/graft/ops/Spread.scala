package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for fused scan-side kernels. */
object Spread {

  /** Repartition `df` to the session's default parallelism when its
    * plan has FEWER partitions — a fused scan-side kernel (per-doc
    * hashing, array window passes, gram explosion) is only as
    * parallel as the input splits, and a small single-file table (one
    * row group = one split) would otherwise serialize the whole
    * kernel on one core: measured 5× on the winnowing bench corpus,
    * invisible on the 32-file probe tiers. On a real multi-split
    * table this adds NO exchange. When it does fire, the shuffle
    * moves the projection's own bytes once — always cheaper than
    * serializing the kernel, and an order of magnitude cheaper than
    * shuffling the kernel's (much wider) intermediate stream.
    *
    * The split count is probed from METADATA (`inputFiles`), never by
    * materializing the plan: `df.rdd.getNumPartitions` under AQE
    * forces every upstream shuffle stage to actually RUN just to
    * read a number, and that work is then thrown away and repeated
    * by the real execution. A frame that is not a pure file read
    * (`inputFiles` empty — joins/aggregates upstream) is returned
    * as-is: its exchanges already spread it. File count undercounts
    * splits for a many-row-group single file — firing a redundant
    * spread there costs one projection-sized shuffle, the cheap
    * direction of the error. */
  def toCores(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val files = try df.inputFiles.length catch { case _: Exception => 0 }
    if (files == 0 || files >= want) df else df.repartition(want)
  }
}
