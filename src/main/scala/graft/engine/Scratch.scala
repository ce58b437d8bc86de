package graft.engine

/** Resolve the fastest scratch root for `spark.local.dir` (shuffle spill,
  * block-manager files, broadcast scratch).
  *
  * Why: on this host the root disk serves shuffle writes at wildly
  * variable latency (measured r12: the identical f2_format_mmssms plan
  * ran 1.9–3.0 s in one QProbe window and 2.5→60.6 s in another, with
  * vmstat showing the JVM idle behind 5–12 MB/s write-back bursts — the
  * noise waves behind every "retried, flat in builder runs" adjudication
  * since r9). Shuffle files are transient per-app scratch; putting them
  * on tmpfs removes the disk from every query's hot path, which is the
  * standard production choice (NVMe/ramdisk shuffle dirs) — at cluster
  * scale this is the `spark.local.dir=/mnt/nvme*` every tuned deployment
  * sets. Catalog layouts under /tmp/graft_* stay on disk on purpose:
  * they are cross-process persistent artifacts, not scratch.
  *
  * Falls back to the JVM default when no tmpfs is present so the mains
  * still run on hosts without /dev/shm.
  */
object Scratch {
  lazy val localDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft_spark")
      d.mkdirs()
      d.getAbsolutePath
    } else sys.props.getOrElse("java.io.tmpdir", "/tmp")
  }
}
