package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C1–C3: row→document projections feeding the sinks.
  *
  * C1/C2 (`/root/reference/src/main/java/Converter/CountStateByUser.java:11-23`,
  * `CountCountryByUser.java:11-23`) flattened a per-window `Map<String,Int>`
  * into `{key, count}` documents; in the Spark design the windowed counts are
  * already exploded rows, so C1/C2 reduce to a rename-projection.
  *
  * C3 (`Converter/UserAddressToDocumentConverter.java:9-15`,
  * `Dto/UserAddress.java:41-61`) flattens the user (renames `name`→`userName`,
  * `email`→`userEmail`) and nests `addresses` as an array of sub-documents
  * that each DROP the redundant `userId` field.
  */
object Projections {

  /** C1: `(window_start, state, count)` → `{state, count}` documents. */
  def stateCountDocuments(counts: DataFrame): DataFrame =
    counts.select(col("state"), col("count"))

  /** C2: `(window_start, country, count)` → `{country, count}` documents. */
  def countryCountDocuments(counts: DataFrame): DataFrame =
    counts.select(col("country"), col("count"))

  /** C3: UserAddress snapshot rows → sink document shape. */
  def userAddressDocument(snapshots: DataFrame): DataFrame =
    snapshots.select(
      col("user.id").as("userId"),
      col("user.name").as("userName"),
      col("user.email").as("userEmail"),
      col("user.genre").as("genre"),
      col("user.registerDate").as("registerDate"),
      transform(col("addresses"), a =>
        struct(
          a.getField("address").as("address"),
          a.getField("city").as("city"),
          a.getField("state").as("state"),
          a.getField("zipCode").as("zipCode"),
          a.getField("country").as("country"))).as("addresses"))
}
