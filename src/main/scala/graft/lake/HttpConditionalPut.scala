package graft.lake

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Path

/** The production shape of [[CommitPublisher.ConditionalPut]]: one HTTP PUT
  * carrying `If-None-Match: *`, arbitrated SERVER-side — exactly the S3 /
  * GCS / Azure conditional-write contract (S3 returns 412 Precondition
  * Failed when the object exists; GCS spells the header
  * `x-goog-if-generation-match: 0`). Same `publish(target, tmp)` contract
  * as the filesystem publishers, so a store-backed lake is a constructor
  * swap, not a protocol change.
  *
  * The object name on the wire is the URL-encoded absolute target path —
  * a stand-in for the bucket key a real deployment would derive from the
  * pool layout. 200/201 → this writer created the object; 412 → the name
  * was already taken (loser retries at the next sequence number, the same
  * observable the link(2) EEXIST path gives); anything else is an error,
  * never a silent loss.
  *
  * CommitPublisherSpec races two OS processes through this client against
  * a local `com.sun.net.httpserver` double that arbitrates create-if-absent
  * server-side — proving the binding preserves the one-winner-per-name
  * guarantee end to end over HTTP.
  */
final class HttpConditionalPut(base: URI) extends CommitPublisher {
  private val client = HttpClient.newHttpClient()

  def publish(target: Path, tmp: Path): Boolean = {
    val key = java.net.URLEncoder.encode(
      target.toAbsolutePath.toString, "UTF-8")
    val req = HttpRequest.newBuilder(base.resolve("/" + key))
      .header("If-None-Match", "*")
      .PUT(HttpRequest.BodyPublishers.ofFile(tmp))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
    resp.statusCode() match {
      case 200 | 201 => true
      case 412       => false
      case c => throw new java.io.IOException(
        s"conditional PUT of ${target.getFileName} returned HTTP $c")
    }
  }
}
