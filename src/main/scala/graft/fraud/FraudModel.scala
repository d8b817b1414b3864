package graft.fraud

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Analog data model mapping the testdata star schema onto the
  * reference DWH (SURVEY.md §3):
  *
  *   DWH_FACT_TRANSACTIONS → events   (card→user_id, amt→value cents,
  *     oper_result := error→REJECT else SUCCESS, city := props.k % 5)
  *   DWH_DIM_CLIENTS       → customer (passport_valid_to synthesized
  *     deterministically from c_custkey; blacklist := c_acctbal < 0)
  *   DWH_DIM_ACCOUNTS      → orders   (valid_to := o_orderdate + 9000d)
  *
  * All derived columns use exact integer / date arithmetic so the DuckDB
  * oracle computes bit-identical values (SURVEY.md §5).
  */
object FraudModel {

  /** Transaction-stream analog of DWH_FACT_TRANSACTIONS
    * (reference sql_scripts/DWH_tables.sql). `card_num` is the
    * deterministic card key a transaction carries in the reference's
    * schema (transactions join cards, not clients — rep_fraud.py:33):
    * each user has two cards (see [[cards]]) and a transaction uses one
    * of them by event parity. */
  def transactions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      col("user_id"),
      (col("user_id") * 10 + col("event_id") % 2).as("card_num"),
      col("ts_us"),
      col("ts_t"),
      cents(col("value")).as("amt_cents"),
      col("event_type"),
      when(col("event_type") === "error", lit("REJECT"))
        .otherwise(lit("SUCCESS")).as("oper_result"),
      (get_json_object(col("props"), "$.k").cast(LongType) % 5).as("city"))

  /** Card dimension analog of DWH_DIM_CARDS (rep_fraud.py:31-33's
    * `cards card ... on card.account = acc.account`): two cards per
    * client account, card_num = client·10 + {0,1}. Derived
    * deterministically from the client key so both engines agree. */
  def cards(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), explode(array(lit(0L), lit(1L))).as("i"))
      .select(
        (col("c_custkey") * 10 + col("i")).as("card_num"),
        col("c_custkey").as("account_num"))

  /** Account-bridge dimension analog of DWH_DIM_ACCOUNTS as used by the
    * dim chain (rep_fraud.py:34 `acc.client = cl.client_id`): one
    * account per client, keyed by the client id. (The contract-expiry
    * accounts used by the account_fraud RULE are [[accounts]] — the
    * reference similarly has per-rule account roles.) */
  def accountsBridge(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("account_num"),
      col("c_custkey").as("client"))

  /** Client dimension analog of DWH_DIM_CLIENTS; `fio` mirrors the
    * reference's name concatenation (rep_fraud.py:15), and
    * `passport_num`/`phone` the mart's identity columns
    * (rep_fraud.py:37-43 REP_FRAUD carries passport + phone) —
    * synthesized deterministically from the client key so the DuckDB
    * twin computes identical strings. */
  def clients(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      concat(col("c_name"), lit(" "), col("c_mktsegment")).as("fio"),
      concat(
        lpad(((col("c_custkey") * 7) % 10000).cast("string"), 4, "0"), lit(" "),
        lpad(((col("c_custkey") * 7919) % 1000000).cast("string"), 6, "0"))
        .as("passport_num"),
      concat(lit("+7"),
        lpad(((col("c_custkey") * 104729) % 1000000000L).cast("string"), 9, "0"))
        .as("phone"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal"),
      date_add(to_date(lit("2024-01-01")), ((col("c_custkey") * 7) % 400).cast("int"))
        .as("passport_valid_to"))

  /** Blacklisted-passport fact analog of DWH_FACT_PASSPORT_BLACKLIST. */
  def passportBlacklist(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_acctbal") < 0).select(col("c_custkey"))

  /** Account dimension analog of DWH_DIM_ACCOUNTS: contract expiry
    * `valid_to` := o_orderdate + 9000 days; only 'P' (pending) orders
    * count as live account contracts in this analog. */
  def accounts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "P")
      .select(
        col("o_orderkey").as("account_num"),
        col("o_custkey").as("client"),
        date_add(to_date(col("o_orderdate")), 9000).as("valid_to"))
}
