package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two isolation properties of the per-process scratch paths
  * behind the steady minhash index and the curate stage dirs (round-9
  * advice: the old dir.hashCode key could collide across data dirs, and
  * a shared path let two processes race write-vs-read). */
class ScratchPathSpec extends AnyFunSuite {
  private val sp = graft.queries.Pipeline.scratchPath _

  test("distinct data dirs can never share a scratch path") {
    // the full sanitized path is the key — not a 32-bit hash that can
    // collide; these two differ in one character
    assert(sp("graft_mh_steady", "/root/testdata/sf0.1", 1L) !=
      sp("graft_mh_steady", "/root/testdata/sf0.2", 1L))
    // classic hashCode-collision pair ("Aa" and "BB" collide on
    // String.hashCode) stays distinct under full-path keying
    assert("Aa".hashCode == "BB".hashCode)
    assert(sp("p", "/data/Aa", 1L) != sp("p", "/data/BB", 1L))
  }

  test("distinct processes can never share a scratch path") {
    assert(sp("graft_mh_steady", "/root/testdata/sf0.1", 100L) !=
      sp("graft_mh_steady", "/root/testdata/sf0.1", 101L))
    // and the real pid is embedded in this process's paths
    val mine = sp("graft_mh_steady", "/root/testdata/sf0.1",
      ProcessHandle.current().pid())
    assert(mine.contains(s"p${ProcessHandle.current().pid()}"))
  }

  test("scratch paths land under java.io.tmpdir with a sanitized key") {
    val p = sp("graft_curate_stages", "/weird dir/with:colons", 7L)
    assert(p.startsWith(sys.props("java.io.tmpdir")))
    val name = java.nio.file.Paths.get(p).getFileName.toString
    assert(name.matches("graft_curate_stages_[A-Za-z0-9._-]+_p7"),
      s"unsanitized scratch dir name: $name")
  }
}
