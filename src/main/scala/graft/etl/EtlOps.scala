package graft.etl

import graft.GQuery

/** Queries exercising the ETL pipeline end-to-end (filled in once the
  * YAML→plan compiler lands; see Compiler.scala).
  */
object EtlOps {
  val queries: Seq[GQuery] = Seq.empty
}
