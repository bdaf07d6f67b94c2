package graft

import graft.io.OntologyDownloader
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** S4/S5 acquisition semantics with an injected offline fetcher
  * (reference: OntologyDownloaderTest.java + updateDownloads flow).
  */
class DownloaderSpec extends AnyFunSuite {

  test("OBO PURL list matches the reference") {
    assert(OntologyDownloader.OboPurls.size == 9)
    assert(OntologyDownloader.OboPurls.contains("http://purl.obolibrary.org/obo/cl.owl"))
    assert(OntologyDownloader.OboPurls.contains("http://purl.obolibrary.org/obo/ro.owl"))
  }

  test("version sniffing precedence") {
    assert(OntologyDownloader.findOboVersion(Paths.get(TestSpark.fixture("version-info-test.owl"))) == "2024-01-15")
    assert(OntologyDownloader.findOboVersion(Paths.get(TestSpark.fixture("macrophage.owl"))) == "2024-09-26")
    assert(OntologyDownloader.findOboVersion(Paths.get(TestSpark.fixture("ro.owl"))) == "2024-04-24")
    assert(OntologyDownloader.findOboVersion(Paths.get(TestSpark.fixture("no-version-test.owl"))) == null)
  }

  private def owl(version: String): Array[Byte] =
    s"""<?xml version="1.0"?>
       |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
       |         xmlns:owl="http://www.w3.org/2002/07/owl#">
       |  <owl:Ontology rdf:about="http://example.org/x.owl">
       |    <owl:versionInfo>$version</owl:versionInfo>
       |  </owl:Ontology>
       |</rdf:RDF>
       |""".stripMargin.getBytes("UTF-8")

  test("update flow: first download promotes, newer rotates, stale is discarded") {
    val dir = Files.createTempDirectory("graft-dl")
    val url = "http://example.org/ontologies/x.owl"
    try {
      // 1. no current file -> promote
      OntologyDownloader.updateDownloads(Seq(url), dir, _ => owl("2024-01-01"))
      assert(Files.exists(dir.resolve("x.owl")))
      assert(OntologyDownloader.findOboVersion(dir.resolve("x.owl")) == "2024-01-01")

      // 2. newer version -> archive old, promote new
      OntologyDownloader.updateDownloads(Seq(url), dir, _ => owl("2024-06-30"))
      assert(OntologyDownloader.findOboVersion(dir.resolve("x.owl")) == "2024-06-30")
      assert(Files.exists(dir.resolve(".archive/x-2024-01-01.owl")))

      // 3. stale (older) version -> discarded, current unchanged
      OntologyDownloader.updateDownloads(Seq(url), dir, _ => owl("2023-12-31"))
      assert(OntologyDownloader.findOboVersion(dir.resolve("x.owl")) == "2024-06-30")
      assert(!Files.exists(dir.resolve("x-new.owl")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
