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
    * shuffling the kernel's (much wider) intermediate stream. */
  def toCores(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }
}
