package graft

/** COMPASS optimizer-driven query entries (§2.8). Filled in as the
  * planner pipeline lands; kept separate so Queries.scala stays the plain
  * relational surface.
  */
object CompassQueries {
  def entries: Seq[Queries.Entry] = Seq.empty
}
