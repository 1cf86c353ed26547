package graft.lake

import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardOpenOption}

/** Test double for an object store's conditional-write endpoint: a
  * ~40-line `com.sun.net.httpserver` server that arbitrates
  * create-if-absent SERVER-side. PUT with `If-None-Match: *` writes the
  * body to the (URL-decoded) request path with `CREATE_NEW` — the kernel
  * makes that atomic under any number of concurrent server threads — and
  * answers 201 to exactly one writer and 412 to every other, the S3
  * observable. The object lands on the local filesystem so pool readers
  * see exactly what they would see against a real store's GET.
  */
object CPutHttpServer {

  def start(): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { ex =>
      try {
        val body = ex.getRequestBody.readAllBytes()
        if (ex.getRequestMethod != "PUT")
          ex.sendResponseHeaders(405, -1)
        else if (ex.getRequestHeaders.getFirst("If-None-Match") != "*")
          ex.sendResponseHeaders(400, -1) // unconditional PUTs are a protocol bug here
        else {
          val path = Paths.get(java.net.URLDecoder.decode(
            ex.getRequestURI.getPath.stripPrefix("/"), "UTF-8"))
          try {
            Files.write(path, body,
              StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
            ex.sendResponseHeaders(201, -1)
          } catch {
            case _: FileAlreadyExistsException => ex.sendResponseHeaders(412, -1)
          }
        }
      } finally ex.close()
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    srv.start()
    srv
  }
}
