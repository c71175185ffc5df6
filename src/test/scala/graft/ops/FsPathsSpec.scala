package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class FsPathsSpec extends AnyFunSuite {
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)
  private val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
    new org.apache.hadoop.conf.Configuration())

  test("committedUnder: plain children and partition subdirs pass") {
    val root = p("/data/corpus")
    assert(FsPaths.committedUnder(lfs, root, p("/data/corpus/part-00000.parquet")))
    assert(FsPaths.committedUnder(lfs, root,
      p("/data/corpus/batch_id=-1/part-0.parquet")))
    assert(FsPaths.committedUnder(lfs, root,
      p("/data/corpus/list_id=3/part-0.parquet")))
  }

  test("committedUnder: any hidden ancestor between root and file fails") {
    val root = p("/data/corpus")
    assert(!FsPaths.committedUnder(lfs, root,
      p("/data/corpus/_temporary/0/_temporary/attempt_1/part-0.parquet")))
    assert(!FsPaths.committedUnder(lfs, root,
      p("/data/corpus/.staging/part-0.parquet")))
    assert(!FsPaths.committedUnder(lfs, root,
      p("/data/corpus/batch_id=0/_temporary/part-0.parquet")))
  }

  test("committedUnder: qualified file paths compare against an unqualified root") {
    // FileSystem.listFiles returns fully-qualified paths; callers hold
    // the unqualified dir string they were given
    val root = p("/data/corpus")
    assert(FsPaths.committedUnder(lfs, root, p("file:/data/corpus/part-0.parquet")))
    assert(!FsPaths.committedUnder(lfs, root,
      p("file:/data/corpus/_tmp/part-0.parquet")))
  }

  test("committedUnder: a file outside root never counts; a hidden ROOT's own children do") {
    assert(!FsPaths.committedUnder(lfs, p("/data/corpus"),
      p("/elsewhere/part-0.parquet")))
    // only ancestors STRICTLY below the root are checked — walking a
    // directory that is itself _-prefixed (a staging area) still sees
    // its own committed children
    assert(FsPaths.committedUnder(lfs, p("/data/_staged"),
      p("/data/_staged/part-0.parquet")))
  }

  test("committedPartPaths: committed files only, sorted; hidden subtrees and non-part names excluded; missing dir empty") {
    val root = java.nio.file.Files.createTempDirectory("graft_fsp_snap_")
    def touch(rel: String): Unit = {
      val f = root.resolve(rel)
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.write(f, Array[Byte](1)): Unit
    }
    touch("part-00001-b.parquet")
    touch("part-00000-a.parquet")
    touch("_SUCCESS")
    touch("_temporary/0/_temporary/attempt_1/part-00002-c.parquet")
    touch(".hidden/part-00003-d.parquet")
    val got = FsPaths.committedPartPaths(lfs, p(root.toString))
    assert(got.map(new org.apache.hadoop.fs.Path(_).getName) ==
      Seq("part-00000-a.parquet", "part-00001-b.parquet"))
    assert(got == got.sorted)
    assert(FsPaths.committedPartPaths(lfs,
      p(root.resolve("nope").toString)).isEmpty)
  }
}
