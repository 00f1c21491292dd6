package graft

import graft.queries.BuildOnce

/** The shared build-once artifact cache: builds exactly once per
  * (name, source fingerprint), reattempts a crashed half-build, and
  * rebuilds when the source file changes. */
class BuildOnceSpec extends SparkSpec {

  test("cached: one build per key, half-builds retried, fingerprint rotates with the source") {
    withTempDir("buildonce") { dir =>
      val src = new java.io.File(dir, "src.parquet")
      java.nio.file.Files.writeString(src.toPath, "v1")
      var builds = 0
      def build(p: String): Unit = {
        builds += 1
        new java.io.File(s"$p/artifact").mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$p/artifact/_SUCCESS"), "")
      }
      val p1 = BuildOnce.cached("spec-a", src)(p => s"$p/artifact/_SUCCESS")(build)
      val p2 = BuildOnce.cached("spec-a", src)(p => s"$p/artifact/_SUCCESS")(build)
      assert(p1 === p2)
      assert(builds === 1, "second call must serve the cached artifact")
      // a crashed half-build (no _SUCCESS) is re-attempted
      rmTree(new java.io.File(s"$p1/artifact/_SUCCESS"))
      BuildOnce.cached("spec-a", src)(p => s"$p/artifact/_SUCCESS")(build)
      assert(builds === 2, "a build without its _SUCCESS must be retried")
      // a DIFFERENT name is a different artifact even over the same source
      val pb = BuildOnce.cached("spec-b", src)(p => s"$p/artifact/_SUCCESS")(build)
      assert(pb !== p1)
      assert(builds === 3)
      // a regenerated source (length change) rotates the fingerprint
      java.nio.file.Files.writeString(src.toPath, "v2-longer")
      val p3 = BuildOnce.cached("spec-a", src)(p => s"$p/artifact/_SUCCESS")(build)
      assert(p3 !== p1, "a regenerated source must not serve the stale artifact")
      assert(builds === 4)
      // clean the tmpdir artifacts this spec created
      Seq(p1, pb, p3).foreach(p => rmTree(new java.io.File(p)))
    }
  }
}
