package graft.docs

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Class frames: the queryable shape of a class (reference:
  * core/query/frame.pl — frames drive document forms and validation).
  * Derived from the same schema-graph constraint triples the Validator
  * uses: rdfs:domain links a property to its class, rdfs:range gives the
  * value type, graft:maxCard the cardinality bound, and the subclass
  * closure folds inherited properties in. */
object Frames {

  /** Frame rows (cls, property, range, maxCard) for every class —
    * inherited properties included via the (sub, sup) closure. */
  def allFrames(schema: DataFrame, subclass: DataFrame): DataFrame = {
    val domain = schema.filter(col("p") === "rdfs:domain")
      .select(col("s").as("property"), col("o_iri").as("owner"))
    val range = schema.filter(col("p") === "rdfs:range")
      .select(col("s").as("property"), col("o_iri").as("range"))
    val card = schema.filter(col("p") === "graft:maxCard")
      .select(col("s").as("property"), col("o_lng").as("maxCard"))
    domain
      .join(broadcast(subclass), col("owner") === col("sup"), "inner")
      .select(col("sub").as("cls"), col("property"))
      .join(range, Seq("property"), "left_outer")
      .join(card, Seq("property"), "left_outer")
      .select(col("cls"), col("property"), col("range"), col("maxCard"))
  }

  def classFrame(schema: DataFrame, subclass: DataFrame, cls: String): DataFrame =
    allFrames(schema, subclass).filter(col("cls") === cls).drop("cls")
}
