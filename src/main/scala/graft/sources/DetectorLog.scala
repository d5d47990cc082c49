package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S5/O8: typed detector-log bag assembly.
  *
  * The reference collects per-item log messages `<log_id> <name> <value>
  * [unit]` into one `detector_log_t` per station, where each item is a
  * tagged union (name, value_s, value_i, value_d, unit, type) and the
  * name→type mapping is a fixed ~60-entry table with String fallback for
  * unknown names (reference include/source/mqtt.h:260-342, item union at
  * include/messages/detectorlog.h:13-65).
  *
  * Spark shape: the mapping is a map LITERAL (stays in codegen — one
  * `element_at` per row, no UDF); the bag is
  * ArrayType(StructType(name, value_s, value_i, value_d, unit, type))
  * built with sort_array(collect_list(struct(...))) per (station, hour).
  * At 100 TB this is one hash aggregate keyed by (station, hour) —
  * map-side partial aggregation keeps the shuffle at bag granularity.
  */
object DetectorLog {

  /** The reference's full name→type table (mqtt.h:260-328). */
  val typeMapping: Seq[(String, String)] = Seq(
    // 8 string-typed parameters
    "UBX_HW_Version" -> "string", "UBX_Prot_Version" -> "string",
    "UBX_SW_Version" -> "string", "hardwareVersionString" -> "string",
    "softwareVersionString" -> "string", "maxGeohashLength" -> "string",
    "uniqueId" -> "string", "geoHash" -> "string",
    // 6 int-typed parameters
    "gainSwitch" -> "int", "polaritySwitch1" -> "int",
    "polaritySwitch2" -> "int", "preampSwitch1" -> "int",
    "preampSwitch2" -> "int", "systemNrCPUs" -> "int",
    // 44 double-typed parameters
    "geoHeightMSL" -> "double", "geoHorAccuracy" -> "double",
    "geoLatitude" -> "double", "geoLongitude" -> "double",
    "geoVertAccuracy" -> "double", "positionDOP" -> "double",
    "RXBufUsage" -> "double", "TXBufUsage" -> "double",
    "adcSamplingTime" -> "double", "antennaPower" -> "double",
    "antennaStatus" -> "double", "biasDAC" -> "double",
    "biasSwitch" -> "double", "calib_coeff2" -> "double",
    "calib_coeff3" -> "double", "calib_rsense" -> "double",
    "calib_vdiv" -> "double", "clockBias" -> "double",
    "clockDrift" -> "double", "fixStatus" -> "double",
    "freqAccuracy" -> "double", "ibias" -> "double",
    "jammingLevel" -> "double", "maxCNR" -> "double",
    "maxRXBufUsage" -> "double", "meanGeoHeightMSL" -> "double",
    "preampAGC" -> "double", "preampNoise" -> "double",
    "rateAND" -> "double", "rateXOR" -> "double",
    "sats" -> "double", "systemFreeMem" -> "double",
    "systemFreeSwap" -> "double", "systemLoadAvg" -> "double",
    "systemUptime" -> "double", "temperature" -> "double",
    "thresh1" -> "double", "thresh2" -> "double",
    "timeAccuracy" -> "double", "timeDOP" -> "double",
    "ubloxUptime" -> "double", "usedSats" -> "double",
    "vbias" -> "double", "vsense" -> "double")

  /** Unit strings carried by some parameters (message field 4). */
  val unitMapping: Seq[(String, String)] = Seq(
    "temperature" -> "C", "timeAccuracy" -> "ns", "rateAND" -> "Hz",
    "rateXOR" -> "Hz", "thresh1" -> "V", "thresh2" -> "V",
    "vbias" -> "V", "vsense" -> "V")

  /** Names synthesized onto the wire: two of each type class plus one
    * NOT in the mapping, to exercise the String fallback. */
  val wireNames: Seq[String] = Seq(
    "geoHash", "UBX_SW_Version", "gainSwitch", "systemNrCPUs",
    "temperature", "timeAccuracy", "rateAND", "customTag")

  private def mapLit(entries: Seq[(String, String)]): Column =
    map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Wire items → typed items: name→type lookup with String fallback,
    * stoi/stod equivalents into the union fields (mqtt.h:330-342).
    * Expects columns (station, hour, name, value_str). */
  def typed(items: DataFrame): DataFrame =
    items
      .withColumn("type",
        coalesce(element_at(mapLit(typeMapping), col("name")), lit("string")))
      .withColumn("value_s",
        when(col("type") === "string", col("value_str")))
      .withColumn("value_i",
        when(col("type") === "int", col("value_str").cast("int")))
      .withColumn("value_d",
        when(col("type") === "double", col("value_str").cast("double")))
      .withColumn("unit",
        coalesce(element_at(mapLit(unitMapping), col("name")), lit("")))
      .drop("value_str")

  /** Typed items → one bag per (station, hour):
    * ArrayType(StructType(name, value_s, value_i, value_d, unit, type)),
    * sorted for a deterministic bag (SURVEY §1.2's detector-log record). */
  def assemble(typedItems: DataFrame): DataFrame =
    typedItems
      .groupBy("station", "hour")
      .agg(count(lit(1)).as("n_items"),
        sort_array(collect_list(struct(
          col("name"), col("value_s"), col("value_i"),
          col("value_d"), col("unit"), col("type")))).as("items"))

  /** O8: the per-item dynamic-field projection of an assembled bag. */
  def explodeItems(bags: DataFrame): DataFrame =
    bags
      .select(col("station"), col("hour"), col("n_items"),
        explode(col("items")).as("it"))
      .select(col("station"), col("hour"), col("n_items"),
        col("it.name").as("name"), col("it.value_s").as("value_s"),
        col("it.value_i").as("value_i"), col("it.value_d").as("value_d"),
        col("it.unit").as("unit"), col("it.type").as("type"))
}
