package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the shared /tmp-cache helpers (round 11 self-review):
  * rewrite caches key by [[Catalog.cacheKey]] and invalidate by
  * [[Catalog.fingerprint]]. Two properties carry the soak results'
  * honesty, so they get pinned here rather than trusted by reading:
  *
  *  - the key must distinguish paths that SANITIZE identically (the
  *    ADVICE r10 #3 follow-up — `/d/sf 1` vs `/d/sf_1` both sanitize
  *    to `_d_sf_1`; a shared key means every alternating probe of the
  *    two sources rebuilds the expensive rewrite);
  *  - the fingerprint must see an IN-PLACE part-file rewrite inside a
  *    Spark-written DIRECTORY corpus (File.length/lastModified on the
  *    directory itself are an fs-block constant and a direct-child
  *    create/delete tracker — blind to exactly the mutation the 10×
  *    soak corpora get on a rebuild).
  */
class CacheFingerprintSpec extends AnyFunSuite {

  test("cacheKey distinguishes paths that sanitize to the same string") {
    val a = Catalog.cacheKey("/data/sf 0.1")
    val b = Catalog.cacheKey("/data/sf_0.1")
    assert(a !== b, s"collision: $a")
    // stable for the same path (it's a cache key, not a nonce)
    assert(a === Catalog.cacheKey("/data/sf 0.1"))
    // and still filesystem-safe + readable
    assert(a.matches("[A-Za-z0-9._-]+"), a)
  }

  test("fingerprint sees an in-place rewrite inside a directory corpus") {
    val dir = Files.createTempDirectory("graft-fp").toFile
    val part = new java.io.File(dir, "part-00000.parquet")
    Files.write(part.toPath, "v1-bytes".getBytes)
    // bookkeeping files must NOT perturb the fingerprint (Spark writes
    // _SUCCESS and .crc siblings that differ run to run)
    Files.write(new java.io.File(dir, "_SUCCESS").toPath, Array.empty[Byte])
    Files.write(new java.io.File(dir, ".part-00000.parquet.crc").toPath,
      "crc".getBytes)
    val before = Catalog.fingerprint(dir.getPath)
    assert(before.contains("part-00000.parquet") && !before.contains("_SUCCESS"))

    // same name, same length, same parent dir — only content + mtime
    // change, the exact mutation a corpus rebuild performs
    Files.write(part.toPath, "v2-bytes".getBytes,
      StandardOpenOption.TRUNCATE_EXISTING)
    part.setLastModified(part.lastModified + 1000)
    assert(Catalog.fingerprint(dir.getPath) !== before,
      "in-place rewrite went undetected")

    // flat-file corpora (the driver layout) fingerprint too
    val flat = Files.createTempFile("graft-fp", ".parquet").toFile
    Files.write(flat.toPath, "x".getBytes)
    assert(Catalog.fingerprint(flat.getPath).nonEmpty)
  }
}
