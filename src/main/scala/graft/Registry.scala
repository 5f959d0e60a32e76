package graft

import graft.queries._

/** The full query inventory (SURVEY.md §2). Each GraftQuery carries its
  * Spark implementation and (where SQL-expressible) its DuckDB oracle.
  */
object Registry {

  lazy val all: Seq[GraftQuery] =
    QCore.all ++ QAgg.all ++ QWin.all ++ QInflux.all ++ QInfluxQL.all ++ QJoin.all ++
      QFunc.all ++ QStream.all ++ QText.all ++ QDedup.all ++ QVector.all ++ QCustom.all ++
      QLayout.all

  lazy val byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
