package graft.queries
import graft.Q
object Windows { val qs: Map[String, Q] = Map() }
