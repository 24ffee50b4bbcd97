package graft.queries
import graft.Q
object Llm { val qs: Map[String, Q] = Map() }
