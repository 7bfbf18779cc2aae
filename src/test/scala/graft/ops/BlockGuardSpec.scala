package graft.ops

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The guard-stat session cache: one compute per (guard, table bytes),
  * invalidation on changed bytes, and None (empty table) cached too. */
class BlockGuardSpec extends AnyFunSuite {

  private def tempTable(): java.io.File = {
    val f = Files.createTempFile("guard_tbl", ".parquet").toFile
    Files.write(f.toPath, "bytes".getBytes("UTF-8"))
    f
  }

  test("worst-block stat computes once per (guard, unchanged table)") {
    val f = tempTable()
    var computes = 0
    def stat() = BlockGuard.worstBlock("g1", f.getPath) {
      computes += 1; Some((Vector("lbl"), 42L))
    }
    assert(stat() === Some((Vector("lbl"), 42L)))
    assert(stat() === Some((Vector("lbl"), 42L)))
    assert(computes === 1, "second call must serve from the session cache")
    // a different guard over the same table keys separately
    BlockGuard.worstBlock("g2", f.getPath) { computes += 1; Some((Vector("o"), 7L)) }
    assert(computes === 2)
  }

  test("changed table bytes invalidate the cached stat") {
    val f = tempTable()
    var computes = 0
    def stat(n: Long) = BlockGuard.worstBlock("g3", f.getPath) {
      computes += 1; Some((Vector("lbl"), n))
    }
    assert(stat(5L) === Some((Vector("lbl"), 5L)))
    // rewrite the table with a newer mtime -> must recompute
    f.setLastModified(f.lastModified() + 10000L)
    assert(stat(9L) === Some((Vector("lbl"), 9L)))
    assert(computes === 2)
  }

  test("an empty table's None is cached like any other stat") {
    val f = tempTable()
    var computes = 0
    def stat() = BlockGuard.worstBlock("g4", f.getPath) { computes += 1; None }
    assert(stat() === None)
    assert(stat() === None)
    assert(computes === 1)
  }
}
