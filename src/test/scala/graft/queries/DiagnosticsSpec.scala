package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The gate-flake forensics contract ([[Connector.digestLines]]): digests
  * are deterministic for identical bytes, and a deliberately injected fault
  * changes EXACTLY the damaged file's line — so when a driver-run oracle
  * row fails, diffing two fixture digests localizes the divergence to a
  * chunk file instead of leaving a bare hash mismatch (the r9 experience).
  */
class DiagnosticsSpec extends AnyFunSuite {

  private def mkFixture(): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("diag")
    (0 until 3).foreach { i =>
      java.nio.file.Files.writeString(dir.resolve(f"chunk-$i%04d.csv"),
        s"id,text\n$i,row-$i\n")
    }
    dir
  }

  test("identical bytes digest identically; a flipped byte is localized") {
    val a = mkFixture()
    val b = mkFixture()
    val da = Connector.digestLines("fx", a.toString)
    val db = Connector.digestLines("fx", b.toString)
    assert(da.size == 3)
    assert(da == db) // determinism: same bytes, same lines

    // fault injection: flip one byte in one chunk of b
    val victim = b.resolve("chunk-0001.csv")
    val bytes = java.nio.file.Files.readAllBytes(victim)
    bytes(bytes.length - 2) = 'X'.toByte
    java.nio.file.Files.write(victim, bytes)

    val db2 = Connector.digestLines("fx", b.toString)
    val changed = da.zip(db2).collect { case (x, y) if x != y => y }
    assert(changed.size == 1, s"exactly the damaged file must differ: $changed")
    assert(changed.head.contains("chunk-0001.csv"))
  }
}
