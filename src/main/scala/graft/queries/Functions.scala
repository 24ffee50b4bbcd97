package graft.queries
import graft.Q
object Functions { val qs: Map[String, Q] = Map() }
