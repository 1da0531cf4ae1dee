package graft.queries

/** Spark-free probe main for the two-process scratch-path isolation
  * spec: prints [[Pipeline.scratchPath]] for the given prefix and data
  * dir as computed by THIS process. ScratchPathSpec forks it in a
  * second JVM and asserts the result differs from the parent's —
  * proving that two concurrent processes (the round-9 hazard: a Verify
  * run overlapping a bench fork) can never share an on-disk artifact
  * path, with real pids rather than injected ones. */
object ScratchPathProbe {
  def main(args: Array[String]): Unit =
    println(Pipeline.scratchPath(args(0), args(1)))
}
