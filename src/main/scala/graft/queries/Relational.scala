package graft.queries
import graft.Q
object Relational { val qs: Map[String, Q] = Map() }
